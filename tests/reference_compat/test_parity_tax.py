"""Trajectory parity vs the real reference engine: PeriodicBracketTax +
WealthRedistribution.

Exercises the planner-controlled ("model_wrapper") tax model with real
planner actions sampled from the reference's masks, and the deterministic
us-federal schedule with WealthRedistribution stacked on top. Covers the full
period cycle: day-1 rate setting (reference redistribution.py:419-434), the
period's income accrual, and last-day enactment with inventory-capped
collection and lump-sum redistribution (redistribution.py:853-915).
"""

import jax
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge


def _run_parity(components, seed, steps, scen_kwargs=None, check_planner_mask=True):
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=4,
        world_size=[15, 15],
        episode_length=60,
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    scen_kwargs = scen_kwargs or {}
    ref_env = foundation.make_env_instance(
        scenario_name="uniform/simple_wood_and_stone",
        components=[{n: dict(k)} for n, k in components],
        **common,
        **scen_kwargs,
    )
    tpu_env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=components,
        **common,
        **scen_kwargs,
    )
    np.random.seed(seed)
    ref_obs = ref_env.reset()
    # Seed build materials so agents earn period income; refresh the tax
    # component's income baseline to the mutated endowments, exactly as its
    # additional_reset_steps computes it (redistribution.py:1109-1139).
    for i in range(common["n_agents"]):
        agent = ref_env.get_agent(str(i))
        agent.state["inventory"]["Wood"] = 6
        agent.state["inventory"]["Stone"] = 6
    ref_tax = ref_env.get_component("PeriodicBracketTax")
    ref_tax.last_coin = [
        float(ref_env.get_agent(str(i)).total_endowment("Coin"))
        for i in range(common["n_agents"])
    ]
    ref_obs = ref_env._generate_observations(
        flatten_observations=True, flatten_masks=True
    )

    n = tpu_env.n_agents
    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(seed))
    refbridge.assert_state_matches(ref_env, tpu_env, state, t=-1)

    gather = ref_env.get_component("Gather")
    step = jax.jit(tpu_env.step)
    action_rng = np.random.default_rng(seed + 1)

    with refbridge.DrawRecorder(seed + 2) as rec:
        for t in range(steps):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, n, action_rng, tpu_env.planner_action_space
            )
            rec.begin_step()
            ref_obs, ref_rew, _done, _info = ref_env.step(ref_actions)
            records = rec.end_step()

            draws = {
                "Gather": refbridge.build_gather_draws(
                    records, gather.gathers[-1], tpu_env,
                    gather_perm_index=_gather_perm_index(components),
                ),
                "scenario": refbridge.build_regrow_draws(records),
            }
            state, tpu_obs, tpu_rew, _tpu_done, _ = step(state, tpu_actions, draws)

            refbridge.assert_state_matches(ref_env, tpu_env, state, t)
            refbridge.assert_rewards_match(ref_rew, tpu_rew, n, t)
            refbridge.assert_obs_matches(ref_obs, tpu_obs, n, t)
            ref_masks = np.stack(
                [np.asarray(ref_obs[str(i)]["action_mask"]).ravel() for i in range(n)]
            )
            np.testing.assert_array_equal(
                np.asarray(tpu_obs["a"]["action_mask"]), ref_masks,
                err_msg=f"agent action masks diverged at t={t}",
            )
            if check_planner_mask and tpu_env.planner_action_space.n_subspaces:
                np.testing.assert_array_equal(
                    np.asarray(tpu_obs["p"]["action_mask"]),
                    np.asarray(ref_obs["p"]["action_mask"]).ravel(),
                    err_msg=f"planner action mask diverged at t={t}",
                )
    return ref_env, tpu_env, state


def _gather_perm_index(components):
    """Index of Gather among components that consume a random agent order
    (Gather and Build both do; reference world.py:417-422)."""
    idx = 0
    for name, _ in components:
        if name == "Gather":
            return idx
        if name == "Build":
            idx += 1
    raise AssertionError("no Gather component")


def test_parity_model_wrapper_tax():
    components = [
        ("Gather", {}),
        ("Build", {}),
        ("PeriodicBracketTax", dict(tax_model="model_wrapper", period=10)),
    ]
    ref_env, _tpu, state = _run_parity(
        components, seed=31, steps=25, scen_kwargs=dict(starting_agent_coin=8)
    )
    # The cycle actually enacted taxes at least twice.
    total = float(state.comp["PeriodicBracketTax"]["total_collected_taxes"])
    ref_total = float(ref_env.get_component("PeriodicBracketTax").total_collected_taxes)
    assert abs(total - ref_total) < 1e-3
    assert ref_total > 0, "no taxes collected — test not exercising enactment"


def test_parity_us_federal_tax_and_wealth_redistribution():
    components = [
        ("Gather", {}),
        ("Build", {}),
        (
            "PeriodicBracketTax",
            dict(
                tax_model="us-federal-single-filer-2018-scaled",
                period=8,
                bracket_spacing="us-federal",
            ),
        ),
        ("WealthRedistribution", {}),
    ]
    _run_parity(
        components, seed=37, steps=20, scen_kwargs=dict(starting_agent_coin=5)
    )


@pytest.mark.slow
def test_parity_tax_annealing():
    components = [
        ("Gather", {}),
        ("Build", {}),
        (
            "PeriodicBracketTax",
            dict(tax_model="model_wrapper", period=10,
                 tax_annealing_schedule=[-10, 0.05]),
        ),
    ]
    _run_parity(components, seed=41, steps=25, scen_kwargs=dict(starting_agent_coin=8))
