"""Trajectory parity vs the real reference engine: ContinuousDoubleAuction.

Same record/inject harness as test_parity_gather_build, with the market in
the loop: Build supplies coin income, CDA runs escrow-backed books with
matching + expiry (reference continuous_double_auction.py:231-406). CDA's
step consumes no RNG, so parity here checks the deterministic order-creation/
matching/settlement/expiry semantics — including the phase ordering (all
commodities' orders are created before any matching; coin freed by one
commodity's trades must not fund another's bids in the same step,
cda.py:439-489).
"""

import jax
import numpy as np
import pytest

import ai_economist_tpu as aet
from tests.reference_compat import refbridge


def _run_parity(seed, steps=30, order_duration=5, max_bid_ask=6):
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=4,
        world_size=[15, 15],
        episode_length=50,
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
    )
    cda_kwargs = dict(
        max_bid_ask=max_bid_ask,
        order_duration=order_duration,
        max_num_orders=3,
        order_labor=0.25,
    )
    components = [
        ("Build", dict(skill_dist="pareto", payment_max_skill_multiplier=3)),
        ("ContinuousDoubleAuction", cda_kwargs),
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
    np.random.seed(seed)
    ref_obs = ref_env.reset()
    # Seed tradable goods so Sell masks open up immediately (agents start
    # with zero Wood/Stone otherwise and no asks ever cross).
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
    ref_cda = ref_env.get_component("ContinuousDoubleAuction")
    step = jax.jit(tpu_env.step)
    action_rng = np.random.default_rng(seed + 1)

    total_ref_trades = 0
    with refbridge.DrawRecorder(seed + 2) as rec:
        for t in range(steps):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, n, action_rng, tpu_env.planner_action_space
            )
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

            # Trade-by-trade agreement with the reference's executed log.
            ref_trades = ref_cda.executed_trades[-1]
            total_ref_trades += len(ref_trades)

    # TPU n_trades metric equals the reference's executed-trade count.
    tpu_trades = int(state.comp["ContinuousDoubleAuction"]["n_trades"])
    assert tpu_trades == total_ref_trades, (tpu_trades, total_ref_trades)
    assert total_ref_trades > 0, "no trades executed — test not exercising CDA"


def test_parity_cda():
    _run_parity(seed=5)


@pytest.mark.slow
def test_parity_cda_multiseed():
    for seed in (13, 23):
        _run_parity(seed=seed, steps=40)
