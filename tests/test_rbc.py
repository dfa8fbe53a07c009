"""RBC environment + trainer tests: market clearing, rationing, taxes,
conservation, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_economist_tpu.scenarios.rbc import (
    RBCConfig,
    RBCEnvironment,
    RBCTrainConfig,
    RBCTrainer,
)


def small_cfg(**kw):
    defaults = dict(
        n_consumers=8, n_firms=4, episode_length=10,
        initial_firm_endowment=22.0 * 1000 * 8,
    )
    defaults.update(kw)
    return RBCConfig(**defaults)


def zero_actions(cfg):
    return {
        "consumer": jnp.zeros((cfg.n_consumers, cfg.n_firms + 2), jnp.int32),
        "firm": jnp.zeros((cfg.n_firms,), jnp.int32),
        "government": jnp.zeros((), jnp.int32),
    }


def test_reset_shapes():
    cfg = small_cfg()
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    G = cfg.global_state_dim
    assert obs["consumer"].shape == (8, G + 2)
    assert obs["firm"].shape == (4, G + 3 + 4)
    assert obs["government"].shape == (G,)
    assert float(state.consumer_budget[0]) == 2000.0
    # twolevel capital
    np.testing.assert_allclose(np.asarray(state.firm_capital),
                               [5000, 5000, 10000, 10000])


def test_demand_scaling_and_market_clearing():
    cfg = small_cfg(interest_rate=0.0, use_importer=False)
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    # Give firms stock to sell; consumers demand maximum (index 10 = 10 units).
    state = state.replace(stocks=jnp.full((4,), 1000.0))
    acts = zero_actions(cfg)
    acts["consumer"] = acts["consumer"].at[:, :4].set(10)  # demand 10 of each
    step = jax.jit(env.step)
    nstate, nobs, rew, done, info = step(state, acts)
    consumed = np.asarray(info["consumed"])
    # price = 1000, budget = 2000: cost = 4*10*1000 = 40000 > 2000
    # -> scaled to budget: each consumer spends <= budget
    spend = consumed @ np.asarray(state.prices)
    assert (spend <= 2000.0 + 1e-2).all()
    # stock decreases by what was consumed (+ production with 0 hours = 0)
    np.testing.assert_allclose(
        np.asarray(nstate.stocks), 1000.0 - consumed.sum(0), rtol=1e-5
    )
    # consumer budgets decrease by spend (no income, no interest);
    # atol because budget - spend cancels to ~0.01 in float32.
    np.testing.assert_allclose(
        np.asarray(nstate.consumer_budget), 2000.0 - spend + 0.01, atol=2e-3
    )


def test_rationing():
    cfg = small_cfg(interest_rate=0.0, use_importer=False)
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = state.replace(
        stocks=jnp.full((4,), 5.0),
        prices=jnp.full((4,), 1.0),  # cheap -> no budget scaling
    )
    acts = zero_actions(cfg)
    acts["consumer"] = acts["consumer"].at[:, :4].set(2)  # 2 units each
    nstate, _, rew, done, info = jax.jit(env.step)(state, acts)
    consumed = np.asarray(info["consumed"])
    # total demand 16 > stock 5 -> rationed to exactly stock
    np.testing.assert_allclose(consumed.sum(0), 5.0, rtol=1e-5)
    assert (np.asarray(nstate.overdemand) == 1.0).all()
    # equal demands -> equal rations
    np.testing.assert_allclose(
        consumed, np.broadcast_to(consumed[0:1], consumed.shape), rtol=1e-5
    )


def test_labor_income_and_taxes():
    cfg = small_cfg(interest_rate=0.0, use_importer=False)
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = state.replace(income_tax=jnp.asarray(0.2))
    acts = zero_actions(cfg)
    # All consumers work max hours (index 4 -> 1040h) for firm 0.
    acts["consumer"] = acts["consumer"].at[:, 4].set(4)
    nstate, _, rew, done, info = jax.jit(env.step)(state, acts)
    hours = 20.0 * 13 * 4
    gross = 22.0 * hours  # initial wage 22
    tax = 0.2 * gross * 8
    np.testing.assert_allclose(float(info["tax_revenue"]), tax, rtol=1e-5)
    # net income + redistribution
    expected = 2000.0 + 0.01 + gross * 0.8 + tax / 8
    np.testing.assert_allclose(
        np.asarray(nstate.consumer_budget), expected, rtol=1e-5
    )
    # firm 0 paid wages -> budget fell; production happened (hours > 0)
    assert float(nstate.firm_budget[0]) < float(state.firm_budget[0])
    assert float(nstate.stocks[0]) > 0.0


def test_importer():
    cfg = small_cfg(interest_rate=0.0, use_importer=True,
                    importer_price=500.0, importer_quantity=10.0)
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = state.replace(stocks=jnp.full((4,), 100.0))  # price 1000 >= 500
    acts = zero_actions(cfg)
    nstate, _, rew, done, info = jax.jit(env.step)(state, acts)
    np.testing.assert_allclose(np.asarray(info["bought_by_importer"]), 10.0)
    # firm revenue from importer sales
    assert (np.asarray(rew["firm"]) > 0).all()


def test_government_reward_and_full_episode():
    cfg = small_cfg()
    env = RBCEnvironment(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for t in range(10):
        key, k = jax.random.split(key)
        acts = {
            "consumer": jax.random.randint(k, (8, 6), 0, 4),
            "firm": jax.random.randint(k, (4,), 0, env.firm_action_table.shape[0]),
            "government": jax.random.randint(k, (), 0, env.govt_action_table.shape[0]),
        }
        state, obs, rew, done, _ = step(state, acts)
        np.testing.assert_allclose(
            float(rew["government"]), float(rew["consumer"].sum()), rtol=1e-5
        )
    assert bool(done)


@pytest.mark.slow
def test_rbc_trainer_runs():
    cfg = small_cfg(episode_length=8)
    env = RBCEnvironment(cfg)
    trainer = RBCTrainer(env, RBCTrainConfig(batch_size=4, entropy=0.01))
    key = jax.random.PRNGKey(0)
    params, opt = trainer.init(key)
    p0 = jax.tree.leaves(params["consumer"])[0].copy()
    params, opt, metrics = trainer.train_episode(
        params, opt, key, jnp.asarray(0), jnp.asarray(1.0)
    )
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    assert not np.allclose(np.asarray(jax.tree.leaves(params["consumer"])[0]),
                           np.asarray(p0))


def test_rbc_bestresponse_freezes_other_classes():
    """Best-response mode (cuda_manager.py:1051-1382): only the trained
    class's params move; the two frozen classes stay byte-identical."""
    cfg = small_cfg(episode_length=8)
    env = RBCEnvironment(cfg)
    trainer = RBCTrainer(env, RBCTrainConfig(batch_size=4))
    key = jax.random.PRNGKey(3)
    params, _ = trainer.init(key)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    params, rewards, history = trainer.bestresponse_train(
        key, "firm", num_episodes=2, params=params
    )
    assert len(rewards) == 2 and all(np.isfinite(r) for r in rewards)
    # Frozen classes byte-identical.
    for frozen in ("consumer", "government"):
        for a, b in zip(jax.tree.leaves(before[frozen]),
                        jax.tree.leaves(params[frozen])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Trained class moved.
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before["firm"]),
                        jax.tree.leaves(params["firm"]))
    )
    assert moved
    assert np.isfinite(history[0]["firm/policy_loss"])
