"""Trajectory parity vs the real reference engine: MULTI-ACTION-MODE agents.

The one action-encoding branch no other suite exercises: with
multi_action_mode_agents=True every mobile agent submits one sub-action per
component subspace each step (reference base_agent.py:407-438 multi-action
parse; get_n_actions contract base_component.py:158-196), the flattened
action mask carries a NO-OP bit per subspace (base_agent.py:440-460), and
the TPU decode takes a [n_agents, n_subspaces] array
(core/spaces.py ActionLayout.decode, multi branch).

Gather + Build + CDA in the loop, so agents genuinely act in several
subspaces simultaneously (move AND build AND place orders in one step).
Same record/inject harness as the other parity suites; asserts bit-exact
state, rewards, obs content, and masks every step.
"""

import jax
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge


def _run_parity(seed, steps=25):
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=4,
        world_size=[15, 15],
        episode_length=50,
        multi_action_mode_agents=True,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    components = [
        ("Build", dict(skill_dist="pareto", payment_max_skill_multiplier=3)),
        ("ContinuousDoubleAuction", dict(
            max_bid_ask=6, order_duration=5, max_num_orders=3,
            order_labor=0.25)),
        ("Gather", dict(skill_dist="pareto")),
    ]
    scen_kwargs = dict(starting_agent_coin=15)
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
    a_layout = tpu_env.agent_action_space
    assert a_layout.multi_action_mode and a_layout.n_subspaces >= 4, (
        "multi-action agents should expose one subspace per component "
        "action family (Build + 2x CDA resources x buy/sell + Gather moves)"
    )

    np.random.seed(seed)
    ref_obs = ref_env.reset()
    # Seed tradable goods so Sell masks open up immediately.
    for i in range(common["n_agents"]):
        agent = ref_env.get_agent(str(i))
        agent.state["inventory"]["Wood"] = 4
        agent.state["inventory"]["Stone"] = 4
    ref_obs = ref_env._generate_observations(
        flatten_observations=True, flatten_masks=True
    )

    n = tpu_env.n_agents
    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(seed))
    refbridge.assert_state_matches(ref_env, tpu_env, state, t=-1)

    gather = ref_env.get_component("Gather")
    step = jax.jit(tpu_env.step)
    action_rng = np.random.default_rng(seed + 1)

    multi_acted_steps = 0
    with refbridge.DrawRecorder(seed + 2) as rec:
        for t in range(steps):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, n, action_rng, tpu_env.planner_action_space,
                agent_layout=a_layout,
            )
            # The point of the suite: agents really do act in >1 subspace.
            if max(sum(a > 0 for a in ref_actions[str(i)]) for i in range(n)) > 1:
                multi_acted_steps += 1
            rec.begin_step()
            ref_obs, ref_rew, _done, _info = ref_env.step(ref_actions)
            records = rec.end_step()

            draws = {
                # Config order [Build, CDA, Gather]: Build consumes perm 0
                # (outcome-invariant), Gather perm 1; CDA consumes none.
                "Gather": refbridge.build_gather_draws(
                    records, gather.gathers[-1], tpu_env, gather_perm_index=1
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
    # Nearly every step should see some agent using several subspaces at
    # once — otherwise this suite degenerates to the single-action one.
    assert multi_acted_steps >= steps // 2, multi_acted_steps


@pytest.mark.slow
def test_parity_multi_action_agents():
    _run_parity(seed=31)


@pytest.mark.slow
def test_parity_multi_action_agents_seed2():
    _run_parity(seed=77)
