"""Episode replay round-trip: save (reset key, actions) -> playback ->
bit-identical trajectory, including through an auto-reset boundary.

The reference re-creates logged episodes byte-identically from per-step RNG
seed states (base_env.py:454-471 `_replay`); here the sim is a deterministic
function of (reset key, action stream), so the replay log is exactly that
pair, saved as lz4 JSON."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv
from ai_economist_tpu.utils.logs import load_episode_log


def build_env():
    return aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {}),
            ("Gather", {}),
            ("PeriodicBracketTax", {"period": 5}),
        ],
        n_agents=3,
        world_size=[9, 9],
        episode_length=8,
    )


def masked_random_actions(key, obs, p_layout):
    ka, kp = jax.random.split(key)
    logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
    acts = {"a": jax.random.categorical(ka, logits, axis=-1).astype(jnp.int32)}
    if p_layout.n_subspaces:
        plog = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
        outs, off = [], 0
        for d in p_layout.action_dims:
            outs.append(jax.random.categorical(kp, plog[..., off:off + d], -1))
            off += d
        acts["p"] = jnp.stack(outs, axis=-1).astype(jnp.int32)
    return acts


def snapshot(states, rew, done):
    """Full-precision trajectory fingerprint: every state leaf + rewards."""
    leaves = [np.asarray(x) for x in jax.tree.leaves(states)]
    leaves += [np.asarray(rew["a"]), np.asarray(rew["p"]), np.asarray(done)]
    return leaves


@pytest.mark.parametrize("reset_mode", ["fresh", "rewind"])
def test_replay_round_trip_bit_identical(tmp_path, reset_mode):
    env = build_env()
    E, T = 4, 20  # episode_length=8 -> the run crosses 2 auto-reset boundaries

    batch = BatchedEnv(env, E, auto_reset=reset_mode)
    states, obs = batch.reset(jax.random.PRNGKey(42), record=True)
    key = jax.random.PRNGKey(7)
    live = []
    saw_done = False
    for t in range(T):
        key, k = jax.random.split(key)
        acts = masked_random_actions(k, obs, env.planner_action_space)
        states, obs, rew, done, _ = batch.step(states, acts)
        saw_done = saw_done or bool(np.asarray(done).any())
        live.append(snapshot(states, rew, done))
    assert saw_done, "test must cross an auto-reset boundary"

    path = batch.save_replay(str(tmp_path / "episode.lz4"))
    log = load_episode_log(path)
    assert log["format"] == "ai_economist_tpu/replay-v1"
    assert len(log["actions"]) == T

    # Playback on a brand-new adapter instance (fresh jit caches, fresh
    # initial-state checkpoint) must reproduce every state leaf bit-for-bit.
    batch2 = BatchedEnv(build_env(), E, auto_reset=reset_mode)
    steps = list(batch2.playback(path))
    assert len(steps) == T
    for t, (states, obs, rew, done, _) in enumerate(steps):
        for a, b in zip(live[t], snapshot(states, rew, done)):
            np.testing.assert_array_equal(a, b, err_msg=f"step {t}")


def test_replay_rejects_mismatched_config(tmp_path):
    env = build_env()
    batch = BatchedEnv(env, 3, auto_reset="fresh")
    _, obs = batch.reset(jax.random.PRNGKey(0), record=True)
    path = batch.save_replay(str(tmp_path / "e.lz4"))

    other = BatchedEnv(build_env(), 5, auto_reset="fresh")
    with pytest.raises(ValueError, match="num_envs"):
        list(other.playback(path))
    other2 = BatchedEnv(build_env(), 3, auto_reset="rewind")
    with pytest.raises(ValueError, match="reset_mode"):
        list(other2.playback(path))

    batch2 = BatchedEnv(build_env(), 3, auto_reset="fresh")
    with pytest.raises(ValueError, match="no replay recorded"):
        batch2.save_replay(str(tmp_path / "none.lz4"))
