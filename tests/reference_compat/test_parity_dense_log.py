"""Event-stream parity vs the ACTUAL reference dense logs.

Drives the reference engine and the TPU engine with identical actions +
injected RNG draws (the same harness as test_parity_gather_build), then
compares the per-step component event streams — gathers (reference
move.py:136-153), builds (build.py:148-161) — against the reference's own
`component.get_dense_log()` output, and checks the decoded TPU dense log has
the reference layout at the shorthand keys (base_env.py:802-812).
"""

import jax
import numpy as np

import ai_economist_tpu as aet
from ai_economist_tpu.utils.logs import DenseLogger
from tests.reference_compat import refbridge


def _canon_gathers(evs):
    return sorted(
        (e["agent"] if "agent" in e else e["agent"],)
        + (e["resource"], int(e["n"]), int(e["loc"][0]), int(e["loc"][1]))
        for e in evs
    )


def _canon_builds(evs):
    return sorted(
        (int(e["builder"]), int(e["loc"][0]), int(e["loc"][1]),
         round(float(e["income"]), 4))
        for e in evs
    )


def test_event_streams_match_reference():
    foundation = refbridge.get_foundation()
    common = dict(
        n_agents=4, world_size=[15, 15], episode_length=30,
        multi_action_mode_agents=False, multi_action_mode_planner=True,
        flatten_observations=True, flatten_masks=True,
    )
    components = [
        ("Gather", dict(skill_dist="pareto")),
        ("Build", dict(skill_dist="pareto", payment_max_skill_multiplier=3)),
    ]
    ref_env = foundation.make_env_instance(
        scenario_name="uniform/simple_wood_and_stone",
        components=[{n: dict(k)} for n, k in components], **common,
    )
    tpu_env = aet.make_env_instance(
        "uniform/simple_wood_and_stone", components=components, **common
    )
    np.random.seed(5)
    ref_obs = ref_env.reset()
    n = tpu_env.n_agents
    state = refbridge.extract_state(ref_env, tpu_env, jax.random.PRNGKey(5))

    gather = ref_env.get_component("Gather")
    build = ref_env.get_component("Build")
    logger = DenseLogger(tpu_env, world_log_every=10)
    step = jax.jit(tpu_env.step)
    record = jax.jit(logger.record)
    action_rng = np.random.default_rng(6)

    recs = []
    steps = 25
    with refbridge.DrawRecorder(7) as rec:
        for t in range(steps):
            ref_actions, tpu_actions = refbridge.sample_masked_actions(
                ref_obs, n, action_rng, tpu_env.planner_action_space
            )
            rec.begin_step()
            ref_obs, ref_rew, _d, _i = ref_env.step(ref_actions)
            records = rec.end_step()
            draws = {
                "Gather": refbridge.build_gather_draws(
                    records, gather.gathers[-1], tpu_env, gather_perm_index=0
                ),
                "scenario": refbridge.build_regrow_draws(records),
            }
            state, tpu_obs, tpu_rew, _td, _ = step(state, tpu_actions, draws)
            recs.append(record(state, tpu_actions, tpu_rew))

    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *recs)
    dense = logger.decode(stacked)

    # Layout: shorthand keys present, one entry per timestep.
    assert "Gather" in dense and "Build" in dense
    assert len(dense["Gather"]) == steps and len(dense["Build"]) == steps

    ref_gathers = gather.get_dense_log()
    ref_builds = build.get_dense_log()
    total_g = total_b = 0
    for t in range(steps):
        rg = [dict(agent=e["agent"], resource=e["resource"], n=e["n"],
                   loc=list(e["loc"])) for e in ref_gathers[t]]
        assert _canon_gathers(dense["Gather"][t]) == _canon_gathers(rg), (
            f"gather events diverged at t={t}"
        )
        rb = [dict(builder=e["builder"], loc=list(e["loc"]),
                   income=e["income"]) for e in ref_builds[t]]
        assert _canon_builds(dense["Build"][t]) == _canon_builds(rb), (
            f"build events diverged at t={t}"
        )
        total_g += len(rg)
        total_b += len(rb)
    # The episode actually traded in events (not vacuous agreement).
    assert total_g > 0, "no gathers happened — test too weak"


def test_trade_and_tax_event_streams_decode():
    """CDA + tax event streams: capacity-bounded arrays decode to the
    reference trade/tax dict layouts and are self-consistent."""
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("ContinuousDoubleAuction", {"max_num_orders": 5}),
            ("Gather", {}),
            ("PeriodicBracketTax", {"period": 5, "tax_model": "us-federal-single-filer-2018-scaled"}),
        ],
        n_agents=4, world_size=[10, 10], episode_length=20,
    )
    logger = DenseLogger(env, world_log_every=10)
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)
    state, obs = env.reset(state)
    # Hand agents coin + resources so trades can clear.
    inv = state.inventory
    inv = inv.at[:, env.world.res_idx("Coin")].set(50.0)
    inv = inv.at[:, env.world.res_idx("Wood")].set(5.0)
    inv = inv.at[:, env.world.res_idx("Stone")].set(5.0)
    state = state.replace(inventory=inv)

    step = jax.jit(env.step)
    record = jax.jit(logger.record)
    rng = np.random.default_rng(1)
    recs = []
    for t in range(20):
        a = jnp_actions = {"a": np.zeros((4,), np.int32)}
        # Random buys/sells within the flat action space.
        mask = np.asarray(obs["a"]["action_mask"])
        for i in range(4):
            valid = np.nonzero(mask[i] > 0)[0]
            a["a"][i] = rng.choice(valid)
        state, obs, rew, done, _ = step(state, {"a": a["a"]})
        recs.append(record(state, {"a": a["a"]}, rew))

    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *recs)
    dense = logger.decode(stacked)

    assert "Trade" in dense and "PeriodicTax" in dense
    n_trades = sum(len(evs) for evs in dense["Trade"])
    assert n_trades > 0, "no trades executed — weak test config"
    for evs in dense["Trade"]:
        for tr in evs:
            assert set(tr) == {"commodity", "buyer", "bid", "bid_lifetime",
                               "seller", "ask", "ask_lifetime", "price",
                               "cost", "income"}
            assert tr["buyer"] != tr["seller"]
            assert tr["ask"] <= tr["price"] <= tr["bid"]
    # Tax events: empty except on period-end steps (t = 5, 10, 15, 20).
    taxes = dense["PeriodicTax"]
    enacted_steps = [t for t, e in enumerate(taxes) if e]
    assert enacted_steps == [4, 9, 14, 19]
    entry = taxes[4]
    assert "schedule" in entry and "cutoffs" in entry
    assert set(entry["0"]) == {"income", "tax_paid", "marginal_rate",
                              "effective_rate", "lump_sum"}
