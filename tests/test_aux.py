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
