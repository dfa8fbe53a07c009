"""Real Business Cycle (RBC) macro simulation, TPU-native.

Rewrite of the reference's standalone CUDA RBC simulation
(ai_economist/real_business_cycle/rbc/cuda/firm_rbc.cu:377-907 and its
PyCUDA harness rbc/cuda_manager.py:589-1930) as a pure-JAX environment:
consumers demand goods and supply labor, firms set prices/wages and invest in
capital (Cobb-Douglas production A*K^(1-alpha)*L^alpha), an importer buys
surplus at a floor price, and the government levies income/corporate taxes
that are redistributed lump-sum. The CUDA kernel's block-level atomicAdd
aggregations become segment sums (deterministic, unlike atomics); its
per-good rationing becomes masked elementwise arithmetic.

All functions are single-env and vmap over the batch axis; one jitted step
replaces one CUDA kernel launch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclass(frozen=True)
class RBCConfig:
    """Mirrors the compile-time -D macros + config dicts
    (rbc/cuda_manager.py:135-145, rbc/constants.py:15-207)."""

    n_consumers: int = 100
    n_firms: int = 10
    n_governments: int = 1
    episode_length: int = 240
    crra_param: float = 0.1
    interest_rate: float = 0.1
    labor_floor: float = 0.0
    use_importer: bool = True
    importer_price: float = 500.0
    importer_quantity: float = 100.0
    initial_consumer_endowment: float = 2000.0
    initial_firm_endowment: float = 22.0 * 1000 * 100
    initial_stocks: float = 0.0
    initial_prices: float = 1000.0
    initial_wages: float = 22.0
    consumer_theta: float = 0.01
    technology: float = 0.01
    count_firm_reward_in_govt: bool = False
    incentivize_firm_activity: bool = False
    firm_boost_reward_factor: float = 1.0

    # Action discretizations (rbc/constants.py:18-49)
    consumption_levels: Tuple[float, ...] = tuple(float(c) for c in range(11))
    work_levels: Tuple[float, ...] = tuple(20.0 * 13 * h for h in range(5))
    price_levels: Tuple[float, ...] = tuple(500.0 * c for c in range(6))
    wage_levels: Tuple[float, ...] = (0.0, 11.0, 22.0, 33.0, 44.0)
    capital_levels: Tuple[float, ...] = (0.1,)
    tax_levels: Tuple[float, ...] = tuple(0.2 * c for c in range(6))

    @property
    def n_agents(self) -> int:
        return self.n_consumers + self.n_firms + self.n_governments

    @property
    def global_state_dim(self) -> int:
        # prices, wages, stocks, overdemand flags, income tax, corp tax, time
        return 4 * self.n_firms + 2 + 1


@struct.dataclass
class RBCState:
    t: jnp.ndarray
    key: jnp.ndarray
    prices: jnp.ndarray  # [F]
    wages: jnp.ndarray  # [F]
    stocks: jnp.ndarray  # [F]
    overdemand: jnp.ndarray  # [F]
    income_tax: jnp.ndarray  # scalar
    corporate_tax: jnp.ndarray  # scalar
    consumer_budget: jnp.ndarray  # [C]
    consumer_theta: jnp.ndarray  # [C]
    firm_budget: jnp.ndarray  # [F]
    firm_capital: jnp.ndarray  # [F]
    firm_alpha: jnp.ndarray  # [F]


class RBCEnvironment:
    """reset(key) -> (state, obs); step(state, actions) -> (state, obs, rew, done)."""

    def __init__(self, config: RBCConfig = RBCConfig()):
        self.cfg = config
        F = config.n_firms
        # Firm action table: price x wage x capital (rbc/constants.py:33-36).
        self.firm_action_table = jnp.asarray(
            list(
                itertools.product(
                    config.price_levels, config.wage_levels, config.capital_levels
                )
            ),
            jnp.float32,
        )  # [A_f, 3]
        # Government action table: income x corporate tax (constants.py:39-47).
        self.govt_action_table = jnp.asarray(
            list(itertools.product(config.tax_levels, config.tax_levels)),
            jnp.float32,
        )  # [A_g, 2]
        self.consumption_table = jnp.asarray(config.consumption_levels, jnp.float32)
        self.work_table = jnp.asarray(config.work_levels, jnp.float32)

        if F == 10:  # reference fixed_array alphas (cuda_manager.py:704-707)
            alphas = [0.2, 0.3, 0.4, 0.6, 0.8, 0.2, 0.3, 0.4, 0.6, 0.8]
        else:
            alphas = [0.2 + 0.6 * (i % 5) / 4 for i in range(F)]
        self.alphas = jnp.asarray(alphas, jnp.float32)
        # twolevel initial capital (cuda_manager.py:690-695)
        cap = [5000.0 if i < F // 2 else 10000.0 for i in range(F)]
        self.init_capital = jnp.asarray(cap, jnp.float32)

    # ------------------------------------------------------------------
    @property
    def action_dims(self) -> Dict[str, Tuple[int, ...]]:
        """Per-policy multi-categorical head sizes."""
        cfg = self.cfg
        return {
            "consumer": tuple(
                [len(cfg.consumption_levels)] * cfg.n_firms
                + [len(cfg.work_levels), cfg.n_firms]
            ),
            "firm": (self.firm_action_table.shape[0],),
            "government": (self.govt_action_table.shape[0],),
        }

    def reset(self, key, theta_anneal: float = 1.0):
        cfg = self.cfg
        state = RBCState(
            t=jnp.zeros((), jnp.int32),
            key=key,
            prices=jnp.full((cfg.n_firms,), cfg.initial_prices),
            wages=jnp.full((cfg.n_firms,), cfg.initial_wages),
            stocks=jnp.full((cfg.n_firms,), cfg.initial_stocks),
            overdemand=jnp.zeros((cfg.n_firms,)),
            income_tax=jnp.zeros(()),
            corporate_tax=jnp.zeros(()),
            consumer_budget=jnp.full(
                (cfg.n_consumers,), cfg.initial_consumer_endowment
            ),
            consumer_theta=jnp.full(
                (cfg.n_consumers,), cfg.consumer_theta * theta_anneal
            ),
            firm_budget=jnp.full((cfg.n_firms,), cfg.initial_firm_endowment),
            firm_capital=self.init_capital,
            firm_alpha=self.alphas,
        )
        return state, self.observations(state)

    # ------------------------------------------------------------------
    def global_state(self, state: RBCState) -> jnp.ndarray:
        """[G] global feature vector (firm_rbc.cu:36-52 layout)."""
        return jnp.concatenate(
            [
                state.prices,
                state.wages,
                state.stocks,
                state.overdemand,
                state.income_tax[None],
                state.corporate_tax[None],
                state.t.astype(jnp.float32)[None],
            ]
        )

    def observations(self, state: RBCState) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        g = self.global_state(state)
        C, F = cfg.n_consumers, cfg.n_firms
        cons = jnp.concatenate(
            [
                jnp.broadcast_to(g, (C,) + g.shape),
                state.consumer_budget[:, None],
                state.consumer_theta[:, None],
            ],
            axis=1,
        )
        firm = jnp.concatenate(
            [
                jnp.broadcast_to(g, (F,) + g.shape),
                state.firm_budget[:, None],
                state.firm_capital[:, None],
                state.firm_alpha[:, None],
                jnp.eye(F),
            ],
            axis=1,
        )
        return {"consumer": cons, "firm": firm, "government": g}

    def decode_actions(self, action_indices: Dict[str, jnp.ndarray]):
        """Multi-categorical indices -> continuous action values.

        Table lookups run as one-hot contractions, not gathers: under the
        training vmap a per-env gather lowers to a batched scatter/gather
        (measured ~10x slower at 4096-env batch), while one-hot einsums
        against these tiny tables fuse into the surrounding elementwise
        work (the ai_economist_tpu/ops design rule)."""
        cfg = self.cfg
        F = cfg.n_firms
        ci = action_indices["consumer"]  # [C, F+2] int

        def lut(table, idx):
            oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
            return jnp.einsum("...k,k...->...", oh, table) \
                if table.ndim == 1 else jnp.einsum("...k,kj->...j", oh, table)

        demand = lut(self.consumption_table, ci[:, :F])  # [C, F]
        hours = lut(self.work_table, ci[:, F])  # [C]
        whichfirm = ci[:, F + 1]  # [C]
        firm = lut(self.firm_action_table, action_indices["firm"])  # [F, 3]
        govt = lut(self.govt_action_table, action_indices["government"])  # [2]
        return {
            "demand": demand,
            "hours": hours,
            "whichfirm": whichfirm,
            "price": firm[:, 0],
            "wage": firm[:, 1],
            "capital_frac": firm[:, 2],
            "income_tax": govt[0],
            "corporate_tax": govt[1],
        }

    # ------------------------------------------------------------------
    def step(self, state: RBCState, actions: Dict[str, jnp.ndarray]):
        """One market day (firm_rbc.cu:377-907)."""
        cfg = self.cfg
        a = self.decode_actions(actions)
        C, F = cfg.n_consumers, cfg.n_firms
        prices, wages, stocks = state.prices, state.wages, state.stocks

        # --- consumers: budget-scaled demand (firm_rbc.cu:620-641) ---
        cost = a["demand"] @ prices  # [C]
        scale = jnp.where(
            (cost > 0) & (cost > state.consumer_budget),
            state.consumer_budget / jnp.where(cost == 0, 1.0, cost),
            1.0,
        )
        net_demand = scale[:, None] * a["demand"]  # [C, F]
        gross_demand = net_demand.sum(axis=0)  # [F]
        # Deterministic segment sum as a one-hot contraction (firm_rbc.cu
        # uses atomicAdd here): a scatter under vmap is a batched scatter,
        # ~10x slower at 4096-env batch than this [C,F] einsum.
        wf_oh = jax.nn.one_hot(a["whichfirm"], F)  # [C, F]
        hours_worked = jnp.einsum("cf,c->f", wf_oh, a["hours"])

        # --- rationing (firm_rbc.cu:666-707) ---
        need_ration = (gross_demand > 0) & (gross_demand > stocks)
        ration = jnp.where(
            need_ration, stocks / jnp.where(gross_demand == 0, 1.0, gross_demand), 1.0
        )
        net_consumed = ration[None, :] * net_demand  # [C, F]
        total_consumed = net_consumed.sum(axis=0)  # [F]

        # --- consumer utility + budget (firm_rbc.cu:709-744) ---
        crra = cfg.crra_param
        util = (
            ((net_consumed + 1.0) ** (1.0 - crra) - 1.0) / (1.0 - crra)
        ).sum(axis=1)
        expense = (net_consumed * prices[None]).sum(axis=1)
        gross_income = jnp.einsum("cf,f->c", wf_oh, wages) * a["hours"]
        income_tax_paid = state.income_tax * gross_income
        cs_budget_delta = 0.01 - expense + gross_income - income_tax_paid
        consumer_reward = util - (state.consumer_theta / 2.0) * a["hours"]

        # --- importer (firm_rbc.cu:751-771) ---
        surplus = stocks - total_consumed
        bought_by_importer = jnp.where(
            cfg.use_importer & (prices >= cfg.importer_price),
            jnp.clip(surplus, 0.0, cfg.importer_quantity),
            0.0,
        )

        # --- firms (firm_rbc.cu:776-837) ---
        revenue = (total_consumed + bought_by_importer) * prices
        wages_paid = hours_worked * wages
        firm_gross_income = revenue - wages_paid
        capital_delta = jnp.maximum(a["capital_frac"] * firm_gross_income, 0.0)
        gross_profit = firm_gross_income - capital_delta
        corp_tax_paid = state.corporate_tax * jnp.maximum(gross_profit, 0.0)
        fm_budget_delta = gross_profit - corp_tax_paid
        firm_reward = gross_profit - corp_tax_paid
        if cfg.incentivize_firm_activity:
            boosted = (fm_budget_delta + state.firm_budget) > 0.0
            firm_reward = firm_reward + jnp.where(
                boosted, cfg.firm_boost_reward_factor * revenue, 0.0
            )

        hours_floored = jnp.where(
            hours_worked < cfg.labor_floor, 0.0, hours_worked
        )
        production = (
            cfg.technology
            * state.firm_capital ** (1.0 - state.firm_alpha)
            * hours_floored ** state.firm_alpha
        )

        # --- taxes redistributed lump-sum (firm_rbc.cu:846-852) ---
        tax_revenue = income_tax_paid.sum() + corp_tax_paid.sum()
        cs_budget_delta = cs_budget_delta + tax_revenue / C

        # --- budget/capital updates + interest (firm_rbc.cu:884-906) ---
        new_cs_budget = state.consumer_budget + cs_budget_delta
        new_cs_budget = new_cs_budget + jnp.where(
            new_cs_budget > 0, new_cs_budget * cfg.interest_rate, 0.0
        )
        new_fm_budget = state.firm_budget + fm_budget_delta
        new_fm_budget = new_fm_budget + jnp.where(
            new_fm_budget > 0, new_fm_budget * cfg.interest_rate, 0.0
        )

        govt_reward = consumer_reward.sum()
        if cfg.count_firm_reward_in_govt:
            govt_reward = govt_reward + firm_reward.sum()

        new_state = state.replace(
            t=state.t + 1,
            prices=a["price"],
            wages=a["wage"],
            stocks=stocks - total_consumed - bought_by_importer + production,
            overdemand=need_ration.astype(jnp.float32),
            income_tax=a["income_tax"],
            corporate_tax=a["corporate_tax"],
            consumer_budget=new_cs_budget,
            firm_budget=new_fm_budget,
            firm_capital=state.firm_capital + capital_delta,
        )
        rew = {
            "consumer": consumer_reward,
            "firm": firm_reward,
            "government": govt_reward,
        }
        done = new_state.t >= cfg.episode_length
        info = {
            "consumed": net_consumed,
            "bought_by_importer": bought_by_importer,
            "tax_revenue": tax_revenue,
            "production": production,
        }
        return new_state, self.observations(new_state), rew, done, info
