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


# ---------------------------------------------------------------------------
# Numpy oracle: literal transliteration of the reference CUDA step
# ---------------------------------------------------------------------------


def numpy_oracle_step(cfg, state, decoded):
    """Single-env RBC market step as plain per-agent numpy loops, written
    directly from the reference kernel's control flow (CudaStep,
    real_business_cycle/rbc/cuda/firm_rbc.cu:377-907): budget demand scaling
    (:620-641), block-tally + rationing (:646-707), consumer CRRA utility,
    income tax and labor disutility (:709-744), importer export market
    (:751-771), firm revenue/capital/corporate tax (:776-837), lump-sum tax
    redistribution (:846-852), interest on positive budgets and capital
    update (:884-906). The reference RBC is CUDA-only and cannot execute
    here; this oracle is its independent correctness stand-in (same role the
    CDA trade-log oracle plays for the auction)."""
    C, F = cfg.n_consumers, cfg.n_firms
    prices = np.asarray(state.prices, np.float64)
    wages = np.asarray(state.wages, np.float64)
    stocks = np.asarray(state.stocks, np.float64)
    cs_budget = np.asarray(state.consumer_budget, np.float64).copy()
    fm_budget = np.asarray(state.firm_budget, np.float64).copy()
    capital = np.asarray(state.firm_capital, np.float64).copy()
    alpha = np.asarray(state.firm_alpha, np.float64)
    theta = np.asarray(state.consumer_theta, np.float64)
    income_tax = float(state.income_tax)
    corp_tax = float(state.corporate_tax)

    demand = np.asarray(decoded["demand"], np.float64)  # [C, F]
    hours = np.asarray(decoded["hours"], np.float64)  # [C]
    whichfirm = np.asarray(decoded["whichfirm"], np.int64)  # [C]

    # Consumers: scale demand to budget (firm_rbc.cu:620-641).
    gross_demand = np.zeros(F)
    num_want = np.zeros(F, np.int64)
    hours_worked = np.zeros(F)
    net_demand = np.zeros((C, F))
    for i in range(C):
        cost = float(demand[i] @ prices)
        scale = 1.0
        if cost > 0.0 and cost > cs_budget[i]:
            scale = cs_budget[i] / cost
        net_demand[i] = scale * demand[i]
        gross_demand += net_demand[i]
        num_want += (net_demand[i] > 0)
        hours_worked[whichfirm[i]] += hours[i]

    # Rationing (firm_rbc.cu:666-707).
    need_ration = (gross_demand > 0.0) & (gross_demand > stocks)
    tax_revenue = 0.0
    total_consumed = np.zeros(F)
    consumer_reward = np.zeros(C)
    cs_delta = np.full(C, 0.01)
    crra = cfg.crra_param
    for i in range(C):
        util = 0.0
        for f in range(F):
            rf = stocks[f] / gross_demand[f] if need_ration[f] else 1.0
            consumed = rf * net_demand[i, f]
            total_consumed[f] += consumed
            util += ((consumed + 1.0) ** (1.0 - crra) - 1.0) / (1.0 - crra)
            cs_delta[i] -= prices[f] * consumed
        gross_income = wages[whichfirm[i]] * hours[i]
        paid = income_tax * gross_income
        cs_delta[i] += gross_income - paid
        tax_revenue += paid
        consumer_reward[i] = util - (theta[i] / 2.0) * hours[i]

    # Importer (firm_rbc.cu:751-771).
    bought_by_importer = np.zeros(F)
    if cfg.use_importer:
        for f in range(F):
            if prices[f] >= cfg.importer_price:
                bought_by_importer[f] = max(
                    min(stocks[f] - total_consumed[f], cfg.importer_quantity), 0.0
                )

    # Firms (firm_rbc.cu:776-837).
    firm_reward = np.zeros(F)
    fm_delta = np.zeros(F)
    capital_delta = np.zeros(F)
    production = np.zeros(F)
    new_prices = np.asarray(decoded["price"], np.float64)
    new_wages = np.asarray(decoded["wage"], np.float64)
    for f in range(F):
        revenue = (total_consumed[f] + bought_by_importer[f]) * prices[f]
        gross_income = revenue - hours_worked[f] * wages[f]
        capital_delta[f] = max(decoded["capital_frac"][f] * gross_income, 0.0)
        gross_profit = gross_income - capital_delta[f]
        corp_paid = corp_tax * max(gross_profit, 0.0)
        fm_delta[f] = gross_profit - corp_paid
        firm_reward[f] = gross_profit - corp_paid
        if cfg.incentivize_firm_activity and (fm_delta[f] + fm_budget[f]) > 0.0:
            firm_reward[f] += cfg.firm_boost_reward_factor * revenue
        tax_revenue += corp_paid
        h = hours_worked[f] if hours_worked[f] >= cfg.labor_floor else 0.0
        production[f] = (
            cfg.technology * capital[f] ** (1.0 - alpha[f]) * h ** alpha[f]
        )

    # Lump-sum redistribution + interest (firm_rbc.cu:846-906).
    cs_delta += tax_revenue / C
    cs_budget += cs_delta
    cs_budget += np.where(cs_budget > 0.0, cs_budget * cfg.interest_rate, 0.0)
    fm_budget += fm_delta
    fm_budget += np.where(fm_budget > 0.0, fm_budget * cfg.interest_rate, 0.0)
    capital += capital_delta

    govt_reward = consumer_reward.sum()
    if cfg.count_firm_reward_in_govt:
        govt_reward += firm_reward.sum()

    return {
        "prices": new_prices,
        "wages": new_wages,
        "stocks": stocks - total_consumed - bought_by_importer + production,
        "overdemand": need_ration.astype(np.float64),
        "income_tax": float(decoded["income_tax"]),
        "corporate_tax": float(decoded["corporate_tax"]),
        "consumer_budget": cs_budget,
        "firm_budget": fm_budget,
        "firm_capital": capital,
        "rew_consumer": consumer_reward,
        "rew_firm": firm_reward,
        "rew_government": govt_reward,
    }


def test_rbc_fuzz_vs_numpy_oracle():
    """Fuzz RBCEnvironment.step against the numpy transliteration of the
    reference kernel across random states and random action indices."""
    cfg = small_cfg(use_importer=True, importer_price=500.0,
                    incentivize_firm_activity=True, labor_floor=100.0)
    env = RBCEnvironment(cfg)
    step = jax.jit(env.step)
    rng = np.random.default_rng(0)
    state, _ = env.reset(jax.random.PRNGKey(0))

    for trial in range(12):
        # Randomize the whole market state (incl. negative budgets — the
        # no-Ponzi region the reference explicitly penalizes).
        state = state.replace(
            prices=jnp.asarray(rng.choice(cfg.price_levels, cfg.n_firms)),
            wages=jnp.asarray(rng.choice(cfg.wage_levels, cfg.n_firms)),
            stocks=jnp.asarray(rng.uniform(0, 50, cfg.n_firms), jnp.float32),
            consumer_budget=jnp.asarray(
                rng.uniform(-500, 4000, cfg.n_consumers), jnp.float32),
            firm_budget=jnp.asarray(
                rng.uniform(-1e4, 1e6, cfg.n_firms), jnp.float32),
            firm_capital=jnp.asarray(
                rng.uniform(100, 2e4, cfg.n_firms), jnp.float32),
            income_tax=jnp.asarray(rng.choice(cfg.tax_levels), jnp.float32),
            corporate_tax=jnp.asarray(rng.choice(cfg.tax_levels), jnp.float32),
        )
        acts = {
            "consumer": jnp.asarray(rng.integers(
                0, [len(cfg.consumption_levels)] * cfg.n_firms
                + [len(cfg.work_levels), cfg.n_firms],
                size=(cfg.n_consumers, cfg.n_firms + 2)), jnp.int32),
            "firm": jnp.asarray(rng.integers(
                0, env.firm_action_table.shape[0], cfg.n_firms), jnp.int32),
            "government": jnp.asarray(rng.integers(
                0, env.govt_action_table.shape[0]), jnp.int32),
        }
        decoded = jax.tree.map(np.asarray, env.decode_actions(acts))
        expect = numpy_oracle_step(cfg, state, decoded)
        new_state, _obs, rew, _done, _info = step(state, acts)

        for k in ("prices", "wages", "stocks", "overdemand", "consumer_budget",
                  "firm_budget", "firm_capital"):
            np.testing.assert_allclose(
                np.asarray(getattr(new_state, k), np.float64), expect[k],
                rtol=2e-5, atol=2e-2, err_msg=f"{k} (trial {trial})",
            )
        np.testing.assert_allclose(
            float(new_state.income_tax), expect["income_tax"], atol=1e-6)
        np.testing.assert_allclose(
            float(new_state.corporate_tax), expect["corporate_tax"], atol=1e-6)
        for k in ("consumer", "firm", "government"):
            np.testing.assert_allclose(
                np.asarray(rew[k], np.float64), expect[f"rew_{k}"],
                rtol=2e-5, atol=2e-2, err_msg=f"rew {k} (trial {trial})",
            )
