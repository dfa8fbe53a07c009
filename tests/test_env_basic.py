"""End-to-end tests for the gather-trade-build slice.

Modeled on the reference's in-repo test (tests/test_env.py:16-111) plus
invariant checks the reference enforces with runtime asserts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet


@pytest.fixture(scope="module")
def env():
    return aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
            ("Gather", {}),
        ],
        n_agents=4,
        world_size=[15, 15],
        episode_length=50,
    )


@pytest.fixture(scope="module")
def reset_out(env):
    return jax.jit(env.reset_fresh)(jax.random.PRNGKey(7))


def test_action_space(env):
    # Build adds 1 action, Gather adds 4; single mode total = 1 + 5.
    assert env.agent_action_space.total_actions == 6
    assert env.planner_action_space.n_subspaces == 0


def test_reset_shapes(env, reset_out):
    state, obs = reset_out
    assert state.loc.shape == (4, 2)
    assert bool(jnp.all(state.loc >= 0))
    # All agents on distinct tiles
    flat = state.loc[:, 0] * 15 + state.loc[:, 1]
    assert len(np.unique(np.asarray(flat))) == 4
    assert "a" in obs and "p" in obs
    assert obs["a"]["flat"].shape[0] == 4
    assert obs["a"]["action_mask"].shape == (4, 6)
    # Egocentric windows: C+1 channels, 11x11 window
    n_ch = len(env.world.map_keys)
    assert obs["a"]["world-map"].shape == (4, n_ch + 1, 11, 11)
    # Source layout was generated
    assert float(state.maps["Wood"].sum()) > 0
    assert float(state.maps["Stone"].sum()) > 0


def test_step_runs_and_keys_stable(env, reset_out):
    state, obs0 = reset_out
    step = jax.jit(env.step)
    actions = {"a": jnp.zeros((4,), jnp.int32)}
    state1, obs1, rew, done, _ = step(state, actions)
    assert int(state1.t) == 1
    assert not bool(done)
    assert set(obs1.keys()) == set(obs0.keys())
    assert obs1["a"]["flat"].shape == obs0["a"]["flat"].shape
    assert rew["a"].shape == (4,)
    assert rew["p"].shape == ()


def test_noop_preserves_state(env, reset_out):
    state, _ = reset_out
    step = jax.jit(env.step)
    actions = {"a": jnp.zeros((4,), jnp.int32)}
    state1, *_ = step(state, actions)
    # NO-OPs: no one moves. (Standing agents may still collect resources
    # underfoot — matching reference move.py:136-142 — which costs
    # collect_labor and credits inventory.)
    np.testing.assert_array_equal(np.asarray(state.loc), np.asarray(state1.loc))
    labor = np.asarray(state1.endogenous[:, env.world.endo_idx("Labor")])
    wood_i, stone_i = env.world.res_idx("Wood"), env.world.res_idx("Stone")
    collected = np.asarray(
        state1.inventory[:, wood_i] + state1.inventory[:, stone_i]
    )
    # labor == collect_labor (1.0) per resource type collected; bonus units
    # don't add labor.
    assert np.all(labor <= collected)
    assert float(labor.sum()) == 0.0 or float(collected.sum()) > 0.0


def test_movement_and_labor(env, reset_out):
    state, obs = reset_out
    step = jax.jit(env.step)
    mask = np.asarray(obs["a"]["action_mask"])
    # Choose the first legal move (actions 2..5 are Gather L/R/U/D) per agent.
    acts = np.zeros(4, np.int64)
    for i in range(4):
        legal = np.nonzero(mask[i, 2:])[0]
        if len(legal):
            acts[i] = 2 + legal[0]
    state1, *_ = step(state, {"a": jnp.asarray(acts)})
    moved = np.any(np.asarray(state.loc) != np.asarray(state1.loc), axis=1)
    labor = np.asarray(state1.endogenous[:, env.world.endo_idx("Labor")])
    for i in range(4):
        if acts[i] > 0 and moved[i]:
            assert labor[i] >= 1.0
    # Distinct tiles invariant holds after movement.
    flat = np.asarray(state1.loc[:, 0] * 15 + state1.loc[:, 1])
    assert len(np.unique(flat)) == 4


def test_build_consumes_and_pays(env):
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(3))
    wood_i = env.world.res_idx("Wood")
    stone_i = env.world.res_idx("Stone")
    coin_i = env.world.res_idx("Coin")
    # Give everyone resources so the build mask opens where tiles are clear.
    inv = state.inventory.at[:, wood_i].set(5.0).at[:, stone_i].set(5.0)
    state = state.replace(inventory=inv)
    step = jax.jit(env.step)
    state1, obs1, *_ = step(state, {"a": jnp.ones((4,), jnp.int32)})  # action 1 = Build
    built = np.asarray(state1.maps["House"]).sum()
    coin = np.asarray(state1.inventory[:, coin_i])
    wood = np.asarray(state1.inventory[:, wood_i])
    n_built = int(np.sum(wood < 5.0))
    assert built == n_built
    assert np.sum(coin > 0) == n_built
    # Owners recorded
    owners = np.asarray(state1.maps["House__owner"])
    assert (owners >= 0).sum() == n_built


def test_episode_completes_and_vmaps(env):
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    reset_b = jax.jit(jax.vmap(env.reset_fresh))
    states, obs = reset_b(keys)
    assert states.loc.shape == (B, 4, 2)

    step_b = jax.jit(jax.vmap(env.step, in_axes=(0, {"a": 0})))
    acts = jnp.zeros((B, 4), jnp.int32)
    for _ in range(3):
        states, obs, rew, done, _ = step_b(states, {"a": acts})
    assert rew["a"].shape == (B, 4)
    assert not bool(done.any())


def test_coin_conservation_no_build(env, reset_out):
    """Without Build actions, total coin stays constant (no minting)."""
    state, _ = reset_out
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    total0 = float(state.inventory[:, env.world.res_idx("Coin")].sum())
    for i in range(5):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (4,), 2, 6)  # moves only
        state, *_ = step(state, {"a": acts})
    total1 = float(state.inventory[:, env.world.res_idx("Coin")].sum())
    assert abs(total0 - total1) < 1e-5


def test_batched_obs_equals_per_env_obs(env):
    """The vmapped obs path (envs-on-lanes windows kernel on TPU, fallback
    elsewhere) must produce exactly the per-env obs for every env in the
    batch — guards the stacked-channel concat/split wiring around
    ops/windows.py."""
    E = 6
    keys = jax.random.split(jax.random.PRNGKey(3), E)
    states, _ = jax.jit(jax.vmap(env.reset_fresh))(keys)
    batched = jax.jit(jax.vmap(env.observations))(states)
    single = jax.jit(env.observations)
    flat_b, treedef_b = jax.tree_util.tree_flatten_with_path(batched)
    for e in range(E):
        s_e = jax.tree.map(lambda x: x[e] if getattr(x, "ndim", 0) else x, states)
        o_e = single(s_e)
        flat_s, treedef_s = jax.tree_util.tree_flatten_with_path(o_e)
        assert str(treedef_b) == str(treedef_s)
        for (pb, vb), (_ps, vs) in zip(flat_b, flat_s):
            vb_e = np.asarray(vb[e]) if np.ndim(vb) > np.ndim(vs) else np.asarray(vb)
            np.testing.assert_array_equal(
                vb_e, np.asarray(vs),
                err_msg=f"env {e} obs {jax.tree_util.keystr(pb)}")
