"""Trajectory parity vs the real reference engine: one-step-economy.

The two-step tax-design benchmark (arXiv:2108.02755 §simplified model;
reference one_step_economy.py:13-336 + simple_labor.py:16-134): step 1 the
planner sets bracket rates (PeriodicBracketTax, SimpleLabor masked off),
step 2 agents choose labor hours, earn skill-scaled income, and taxes enact.
Nearly deterministic — the only reference RNG is the component-construction
skill table (copied via extract_state) and the irrelevant random agent order
inside SimpleLabor.component_step (order-independent outcome).
"""

import jax
import numpy as np

import ai_economist_tpu as aet
from tests.reference_compat import refbridge

N_AGENTS = 5


def _build_pair(seed):
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=N_AGENTS,
        world_size=[2, 2],
        episode_length=2,
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    components = [
        # Labor before tax in config order so step-2 enactment sees the
        # step-2 labor income (component steps run in config order,
        # reference base_env.py:1002-1003).
        ("SimpleLabor", dict(mask_first_step=True)),
        ("PeriodicBracketTax",
         dict(tax_model="model_wrapper", period=2, rate_disc=0.05)),
    ]
    scen = dict(agent_reward_type="coin_minus_labor_cost",
                planner_reward_type="inv_income_weighted_utility",
                labor_exponent=2.0, labor_cost=1.0)
    # The reference samples its SimpleLabor skill table from GLOBAL numpy
    # RNG at component construction (simple_labor.py:75-81) — seed first.
    np.random.seed(seed)
    ref_env = foundation.make_env_instance(
        scenario_name="one-step-economy",
        components=[{n: dict(k)} for n, k in components],
        **common,
        **scen,
    )
    tpu_env = aet.make_env_instance(
        "one-step-economy", components=components, **common, **scen
    )
    return ref_env, tpu_env


def _run_episode(ref_env, tpu_env, seed):
    np.random.seed(seed + 1)
    ref_obs = ref_env.reset()
    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(seed))
    refbridge.assert_state_matches(ref_env, tpu_env, state, t=-1)
    # Skills copied from the reference's construction-time table.
    np.testing.assert_allclose(
        np.asarray(state.agent_fields["skill"]),
        [ref_env.get_agent(str(i)).state["skill"] for i in range(N_AGENTS)],
        rtol=1e-6,
    )

    step = jax.jit(tpu_env.step)
    rng = np.random.default_rng(seed + 2)
    tpu_obs = tpu_env.observations(state)
    refbridge.assert_obs_matches(ref_obs, tpu_obs, N_AGENTS, t=-1)

    with refbridge.DrawRecorder(seed + 3):
        for t in range(2):
            # Reset-time masks: SimpleLabor off on the first decision
            # (simple_labor.py:97-103), on afterward.
            ref_masks = np.stack(
                [np.asarray(ref_obs[str(i)]["action_mask"]).ravel()
                 for i in range(N_AGENTS)]
            )
            np.testing.assert_array_equal(
                np.asarray(tpu_obs["a"]["action_mask"]), ref_masks,
                err_msg=f"agent masks diverged at t={t}",
            )
            np.testing.assert_array_equal(
                np.asarray(tpu_obs["p"]["action_mask"]),
                np.asarray(ref_obs["p"]["action_mask"]).ravel(),
                err_msg=f"planner mask diverged at t={t}",
            )
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, N_AGENTS, rng, tpu_env.planner_action_space
            )
            ref_obs, ref_rew, ref_done, _ = ref_env.step(ref_actions)
            state, tpu_obs, tpu_rew, tpu_done, _ = step(state, tpu_actions)

            refbridge.assert_state_matches(ref_env, tpu_env, state, t)
            refbridge.assert_rewards_match(ref_rew, tpu_rew, N_AGENTS, t)
            refbridge.assert_obs_matches(ref_obs, tpu_obs, N_AGENTS, t)
            assert bool(tpu_done) == bool(ref_done["__all__"])

    ref_tax = ref_env.get_component("PeriodicBracketTax")
    total = float(state.comp["PeriodicBracketTax"]["total_collected_taxes"])
    assert abs(total - float(ref_tax.total_collected_taxes)) < 1e-3
    return float(ref_tax.total_collected_taxes)


def test_parity_one_step_economy():
    ref_env, tpu_env = _build_pair(seed=61)
    collected = 0.0
    for ep, seed in enumerate((61, 62, 63)):
        collected += _run_episode(ref_env, tpu_env, seed)
    assert collected > 0, "no taxes enacted across episodes"
