"""Training stack tests: policy forward, PPO iteration, multi-chip dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet
from ai_economist_tpu.training.models import ConvLSTMPolicy, MLPPolicy
from ai_economist_tpu.training.ppo import PPOConfig, gae
from ai_economist_tpu.training.trainer import TwoLevelTrainer


def small_env():
    return aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Build", {}), ("Gather", {}),
                    ("PeriodicBracketTax", {"period": 4})],
        n_agents=2,
        world_size=[8, 8],
        episode_length=8,
    )


def test_conv_lstm_forward_and_mask():
    env = small_env()
    state, obs = jax.jit(env.reset_fresh)(jax.random.PRNGKey(0))
    model = ConvLSTMPolicy(
        num_actions=env.agent_action_space.total_actions, fc_dim=16, cell_size=16
    )
    obs_a = {k: obs["a"][k] for k in
             ("world-map", "world-idx_map", "flat", "time", "action_mask")}
    carry = model.initial_carry(env.n_agents)
    params = model.init(jax.random.PRNGKey(1), obs_a, carry)
    logits, value, carry2 = jax.jit(model.apply)(params, obs_a, carry)
    assert logits.shape == (2, env.agent_action_space.total_actions)
    assert value.shape == (2,)
    # masked actions get -1e7
    mask = np.asarray(obs_a["action_mask"])
    lg = np.asarray(logits)
    assert (lg[mask == 0] < -1e6).all()
    assert np.isfinite(lg[mask == 1]).all()


def test_gae_simple():
    T, B = 3, 2
    rew = jnp.ones((T, B))
    val = jnp.zeros((T, B))
    done = jnp.zeros((T, B), bool)
    adv, ret = gae(rew, val, done, jnp.zeros((B,)), gamma=1.0, lam=1.0)
    np.testing.assert_allclose(np.asarray(ret[0]), 3.0)
    np.testing.assert_allclose(np.asarray(ret[-1]), 1.0)
    # done truncates the return
    done = done.at[1].set(True)
    adv, ret = gae(rew, val, done, jnp.zeros((B,)), gamma=1.0, lam=1.0)
    np.testing.assert_allclose(np.asarray(ret[0]), 2.0)


def test_non_divisor_minibatch_count_raises():
    """A num_minibatches that doesn't divide the batch must fail loudly —
    silently training with a different minibatch count than configured is a
    config trap (sgd_minibatch_size semantics, rllib/phase1/config.yaml)."""
    env = small_env()
    trainer = TwoLevelTrainer(
        env, num_envs=4,
        cfg=PPOConfig(rollout_len=2, epochs=1, num_minibatches=3),
        model_kwargs=dict(fc_dim=16, cell_size=16, emb_dim=2),
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_minibatches"):
        trainer.train_iteration(ts, 0.025, 0.1)


@pytest.mark.slow
def test_train_iteration_runs():
    env = small_env()
    trainer = TwoLevelTrainer(
        env, num_envs=4,
        cfg=PPOConfig(rollout_len=4, epochs=1, num_minibatches=2),
        model_kwargs=dict(fc_dim=16, cell_size=16, emb_dim=2),
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    params_before = jax.tree.leaves(ts.params_a)[0].copy()
    ts, metrics = trainer.train_iteration(ts, 0.025, 0.1)
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    assert int(ts.iteration) == 1
    # Parameters actually updated
    params_after = jax.tree.leaves(ts.params_a)[0]
    assert not np.allclose(np.asarray(params_before), np.asarray(params_after))
    # Second iteration reuses the compiled function
    ts, metrics = trainer.train_iteration(ts, 0.025, 0.1)
    assert int(ts.iteration) == 2


@pytest.mark.slow
def test_fresh_auto_reset_rerandomizes_layouts():
    """Consecutive episodes of one replica must get different layouts under
    the trainer's default reset_mode="fresh" (reference RLlib-path behavior,
    tutorials/rllib/env_wrapper.py:207-211), unlike the WarpDrive rewind."""
    from ai_economist_tpu.adapters.batched import auto_reset_step

    env = small_env()
    n_mobile_actions = env.agent_action_space.total_actions

    def run_episodes(reset_mode):
        key = jax.random.PRNGKey(7)
        reset_b = jax.jit(jax.vmap(env.reset_fresh))
        states, obs = reset_b(jax.random.split(key, 2))
        initial = states
        layouts = [np.asarray(states.maps["WoodSourceBlock"][0])]
        step = jax.jit(lambda s, a: auto_reset_step(env, s, a, initial,
                                                    reset_mode))
        for t in range(env.episode_length + 1):
            acts = {"a": jnp.zeros((2, env.n_agents), jnp.int32),
                    "p": jnp.zeros((2, env.planner_action_space.n_subspaces),
                                   jnp.int32)}
            states, obs, rew, done, _ = step(states, acts)
            if bool(np.asarray(done).any()):
                layouts.append(np.asarray(states.maps["WoodSourceBlock"][0]))
        return layouts

    fresh = run_episodes("fresh")
    assert len(fresh) >= 2
    assert not np.array_equal(fresh[0], fresh[1]), \
        "fresh reset produced an identical layout"

    rewind = run_episodes("rewind")
    assert np.array_equal(rewind[0], rewind[1]), \
        "rewind reset should replay the saved layout"


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs >= 2 devices (virtual ok)")
    ge.dryrun_multichip(n)


def test_sequence_twin_matches_step_scan():
    """ConvLSTMPolicySeq (time-parallel torso + scanned LSTM cell, the PPO
    update path) must reproduce the step-wise ConvLSTMPolicy scanned over
    time — same param tree, same outputs — in both the single-fold and the
    chunked-torso lowering."""
    import numpy as np
    from ai_economist_tpu.training.models import ConvLSTMPolicy, sequence_twin

    T, B, A = 6, 4, 9
    m = ConvLSTMPolicy(num_actions=A)
    rng = np.random.RandomState(1)
    obs_seq = {
        "world-map": jnp.asarray(
            rng.randint(0, 5, (T, B, 6, 11, 11)).astype(np.float32)),
        "world-idx_map": jnp.asarray(
            rng.randint(0, 6, (T, B, 2, 11, 11)).astype(np.float32)),
        "flat": jnp.asarray(rng.rand(T, B, 7).astype(np.float32)),
        "time": jnp.asarray(rng.rand(T, B, 1).astype(np.float32)),
        "action_mask": jnp.asarray(
            (rng.rand(T, B, A) > 0.3).astype(np.float32)),
    }
    carry0 = m.initial_carry(B)
    p = m.init(jax.random.PRNGKey(0),
               {k: v[0] for k, v in obs_seq.items()}, carry0)

    def step(c, obs_t):
        lo, va, c = m.apply(p, obs_t, c)
        return c, (lo, va)

    cT, (L1, V1) = jax.lax.scan(step, carry0, obs_seq)

    seq = sequence_twin(m)
    L2, V2, cT2 = seq.apply(p, obs_seq, carry0)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-6)
    for a, b in zip(jax.tree.leaves(cT), jax.tree.leaves(cT2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Chunked torso (T=6, chunk target forces 2-step chunks).
    seq_chunked = type(seq)(num_actions=A, torso_batch_target=2 * B)
    L3, V3, cT3 = seq_chunked.apply(p, obs_seq, carry0)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V3), atol=1e-5)

    # uint8-compressed map obs (the trainer's rollout-batch storage) must
    # give identical results to f32 — the values are exact small ints.
    obs_u8 = dict(obs_seq)
    obs_u8["world-map"] = obs_seq["world-map"].astype(jnp.uint8)
    obs_u8["world-idx_map"] = obs_seq["world-idx_map"].astype(jnp.uint8)
    L4, V4, _ = seq.apply(p, obs_u8, carry0)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L4))
