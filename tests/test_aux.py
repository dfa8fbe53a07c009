"""Auxiliary subsystem tests: Saez sync, gym adapter, logging, checkpointing."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.gym_wrapper import GymStyleEnv
from ai_economist_tpu.parallel.saez import sync_saez_buffers
from ai_economist_tpu.utils.checkpoint import CheckpointManager
from ai_economist_tpu.utils.logs import load_episode_log, save_episode_log


def test_saez_global_sync():
    R = 4
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Gather", {}),
                    ("PeriodicBracketTax", {"tax_model": "saez", "period": 2,
                                            "saez_buffer_size": 8,
                                            "saez_global_replicas": R})],
        n_agents=4, world_size=[8, 8], episode_length=8,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), R)
    states, obs = jax.jit(jax.vmap(env.reset_fresh))(keys)
    step = jax.jit(jax.vmap(env.step, in_axes=(0, {"a": 0})))
    coin_i = env.world.res_idx("Coin")
    for t in range(4):
        inv = states.inventory.at[:, :, coin_i].add(5.0)
        states = states.replace(inventory=inv)
        states, obs, rew, done, _ = step(states, {"a": jnp.zeros((R, 4), jnp.int32)})
    cs = states.comp["PeriodicBracketTax"]
    local_counts = np.asarray(cs["buf_count"])
    assert (local_counts == 8).all()  # 2 tax days x 4 agents
    states = jax.jit(sync_saez_buffers)(states)
    cs = states.comp["PeriodicBracketTax"]
    assert (np.asarray(cs["global_count"]) == 8 * R).all()
    # All replicas share the same global buffer contents (as multisets).
    g = np.asarray(cs["global_buf"])
    for r in range(1, R):
        np.testing.assert_allclose(np.sort(g[0], axis=0), np.sort(g[r], axis=0))
    assert (np.asarray(cs["additions_this_episode"]) == 0).all()


def test_gym_adapter_reference_api():
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Build", {}), ("Gather", {})],
        n_agents=4, world_size=[10, 10], episode_length=5,
    )
    g = GymStyleEnv(env, seed=0)
    obs = g.reset()
    assert set(obs.keys()) == {"0", "1", "2", "3", "p"}
    assert "flat" in obs["0"] and "action_mask" in obs["0"]
    assert "p0" in obs["p"]  # agent-wise planner sub-obs
    obs, rew, done, info = g.step({"0": 2, "1": 0, "2": 3, "3": 1})
    assert set(rew.keys()) == {"0", "1", "2", "3", "p"}
    assert done == {"__all__": False}
    for _ in range(4):
        obs, rew, done, info = g.step({})
    assert done["__all__"]
    m = g.metrics()
    assert "social/productivity" in m


def test_gym_adapter_spaces_synthesis():
    """Space synthesis from a probe reset (reference env_wrapper.py:139-171,
    tutorials/rllib/env_wrapper.py:74-101)."""
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Build", {}), ("Gather", {}),
                    ("PeriodicBracketTax", {"period": 5})],
        n_agents=4, world_size=[10, 10], episode_length=5,
    )
    g = GymStyleEnv(env, seed=0)
    obs_sp = g.observation_space
    obs = g.reset()
    # Every obs key is covered by a Box of the right shape, and contains().
    for k, v in obs["0"].items():
        sp = obs_sp[k]
        assert tuple(sp.shape) == np.asarray(v).reshape(np.asarray(v).shape or (1,)).shape
    assert obs_sp.contains({k: np.asarray(v).reshape(np.asarray(v).shape or (1,))
                            for k, v in obs["0"].items()})
    # Agents are single-action mode -> Discrete; planner multi -> MultiDiscrete.
    assert g.action_space.n == env.agent_action_space.total_actions
    nvec = g.action_space_pl.nvec
    assert tuple(nvec.tolist()) == tuple(env.planner_action_space.action_dims)
    assert g.observation_space_pl.contains(
        {k: np.asarray(v).reshape(np.asarray(v).shape or (1,))
         for k, v in obs["p"].items()})
    # Sampled actions are accepted by the env.
    a = {str(i): int(g.action_space.sample()) for i in range(4)}
    a["p"] = g.action_space_pl.sample()
    g.step(a)


def test_dense_log_save_load():
    log = {"states": [{"0": {"inventory": {"Coin": 1.0}}}],
           "rewards": [{"0": 0.5, "p": np.float32(0.1)}],
           "world": [np.zeros((2, 3))]}
    with tempfile.TemporaryDirectory() as d:
        path = save_episode_log(log, os.path.join(d, "ep.json"))
        loaded = load_episode_log(path)
    assert loaded["rewards"][0]["0"] == 0.5
    assert loaded["world"][0] == [[0, 0, 0], [0, 0, 0]]


def test_checkpoint_roundtrip():
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7)}
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(1, tree)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )
        restored = mgr.restore(abstract)
        mgr.close()
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["step"]) == 7


def test_plotting_breakdown_and_vis():
    """Dense-log breakdown + world-range visualization
    (tutorials/utils/plotting.py:176-444 analog), driven by real event
    streams from a short episode."""
    import matplotlib
    matplotlib.use("Agg")
    import jax
    from ai_economist_tpu.utils.logs import DenseLogger
    from ai_economist_tpu.utils import plotting

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Build", {}), ("ContinuousDoubleAuction", {"max_num_orders": 3}),
                    ("Gather", {})],
        n_agents=4, world_size=[10, 10], episode_length=12,
    )
    logger = DenseLogger(env, world_log_every=5)
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)
    state, obs = env.reset(state)
    inv = state.inventory.at[:, env.world.res_idx("Coin")].set(20.0)
    inv = inv.at[:, env.world.res_idx("Wood")].set(3.0)
    inv = inv.at[:, env.world.res_idx("Stone")].set(3.0)
    state = state.replace(inventory=inv)
    step = jax.jit(env.step)
    record = jax.jit(logger.record)
    rng = np.random.default_rng(0)
    recs = []
    for t in range(12):
        mask = np.asarray(obs["a"]["action_mask"])
        a = np.array([rng.choice(np.nonzero(mask[i] > 0)[0]) for i in range(4)],
                     np.int32)
        state, obs, rew, done, _ = step(state, {"a": a})
        recs.append(record(state, {"a": a}, rew))
    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *recs)
    dense = logger.decode(stacked)

    assert len(dense["world"]) == 12  # entry per step, falsy when not logged
    figs, incomes, endows, c_trades, all_builds = plotting.breakdown(dense)
    assert figs[1] is not None and figs[2] is not None
    assert len(incomes["Total"]) == 4 and len(endows) == 4
    s = plotting.report(c_trades, all_builds, 4)
    assert "Agent  0" in s and "Income (Build)" in s
    ax = plotting.vis_builds(dense)
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_uniform_permutation_small_and_large():
    """ops.uniform_permutation: validity + approximate uniformity on both
    code paths — the exact n! table (n <= 6) and the sort-free 64-bit
    counting-rank path (n > 6, the 10-agent-config path)."""
    from ai_economist_tpu.ops import uniform_permutation

    for n in (4, 8, 10):
        f = jax.jit(lambda k, n=n: uniform_permutation(k, n))
        perms = np.stack([
            np.asarray(f(jax.random.PRNGKey(i))) for i in range(600)
        ])
        # Every draw is a permutation of range(n).
        assert perms.shape == (600, n)
        sorted_rows = np.sort(perms, axis=1)
        np.testing.assert_array_equal(sorted_rows, np.tile(np.arange(n), (600, 1)))
        # Positional uniformity: each value's mean position ~ (n-1)/2.
        mean_pos = np.array([
            np.argmax(perms == v, axis=1).mean() for v in range(n)
        ])
        se = np.sqrt((n * n - 1) / 12.0 / perms.shape[0])
        assert np.all(np.abs(mean_pos - (n - 1) / 2) < 5 * se), mean_pos
