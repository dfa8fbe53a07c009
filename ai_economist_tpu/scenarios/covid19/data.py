"""COVID-19 scenario data: fitted-parameter loading + synthetic generation.

The reference ships fitted artifacts (real_world_data.npz, fitted_params.json,
model_constants.json — see ai_economist/foundation/scenarios/covid19/
covid19_env.py:143-168, 1517-1611). This module loads artifacts with that
exact schema from a user-supplied directory, or generates self-consistent
SYNTHETIC artifacts (same shapes/keys) for development and testing when no
real artifacts are available.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Dict

import numpy as np

DATE_FORMAT = "%Y-%m-%d"


@dataclass
class CovidData:
    """All constants + real-world arrays the covid scenario consumes."""

    us_state_population: np.ndarray  # [N]
    us_population: float
    gdp_per_capita: float
    num_stringency_levels: int
    sir_gamma: float
    sir_mortality: float
    state_names: Dict[str, str]

    beta_delay: int
    beta_slopes: np.ndarray  # [N]
    beta_intercepts: np.ndarray  # [N]
    policy_start_date: str
    filter_len: int
    conv_lambdas: np.ndarray  # [F]
    unemployment_bias: np.ndarray  # [N]
    grouped_conv_weights: np.ndarray  # [N, F]
    value_of_life: float
    inferred_weightage_agent_health: np.ndarray  # [N]
    inferred_weightage_planner_health: float
    min_marginal_agent_health: np.ndarray
    max_marginal_agent_health: np.ndarray
    min_marginal_agent_economic: np.ndarray
    max_marginal_agent_economic: np.ndarray
    min_marginal_planner_health: float
    max_marginal_planner_health: float
    min_marginal_planner_economic: float
    max_marginal_planner_economic: float

    real_world: Dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_states(self) -> int:
        return len(self.us_state_population)


def load(path: str) -> CovidData:
    """Load reference-schema artifacts from a directory
    (covid19_env.py:1517-1611)."""
    with open(os.path.join(path, "model_constants.json")) as f:
        mc = json.load(f)
    with open(os.path.join(path, "fitted_params.json")) as f:
        fp = json.load(f)
    npz = np.load(os.path.join(path, "real_world_data.npz"))
    real_world = {k: np.asarray(npz[k]) for k in npz}

    n = len(mc["US_STATE_POPULATION"])
    num_filters = len(fp["CONV_LAMBDAS"])
    return CovidData(
        us_state_population=np.asarray(mc["US_STATE_POPULATION"], np.float64),
        us_population=float(mc["US_POPULATION"]),
        gdp_per_capita=float(mc["GDP_PER_CAPITA"]),
        num_stringency_levels=int(mc["NUM_STRINGENCY_LEVELS"]),
        sir_gamma=float(mc["SIR_GAMMA"]),
        sir_mortality=float(mc["SIR_MORTALITY"]),
        state_names=mc["US_STATE_IDX_TO_STATE_NAME"],
        beta_delay=int(fp["BETA_DELAY"]),
        beta_slopes=np.asarray(fp["BETA_SLOPES"], np.float64),
        beta_intercepts=np.asarray(fp["BETA_INTERCEPTS"], np.float64),
        policy_start_date=fp["POLICY_START_DATE"],
        filter_len=int(fp["FILTER_LEN"]),
        conv_lambdas=np.asarray(fp["CONV_LAMBDAS"], np.float64),
        unemployment_bias=np.asarray(fp["UNEMPLOYMENT_BIAS"], np.float64),
        grouped_conv_weights=np.asarray(
            fp["GROUPED_CONVOLUTIONAL_FILTER_WEIGHTS"], np.float64
        ).reshape(n, num_filters),
        value_of_life=float(fp["VALUE_OF_LIFE"]),
        inferred_weightage_agent_health=np.asarray(
            fp["INFERRED_WEIGHTAGE_ON_AGENT_HEALTH_INDEX"], np.float64
        ),
        inferred_weightage_planner_health=float(
            fp["INFERRED_WEIGHTAGE_ON_PLANNER_HEALTH_INDEX"]
        ),
        min_marginal_agent_health=np.asarray(
            fp["MIN_MARGINAL_AGENT_HEALTH_INDEX"], np.float64
        ),
        max_marginal_agent_health=np.asarray(
            fp["MAX_MARGINAL_AGENT_HEALTH_INDEX"], np.float64
        ),
        min_marginal_agent_economic=np.asarray(
            fp["MIN_MARGINAL_AGENT_ECONOMIC_INDEX"], np.float64
        ),
        max_marginal_agent_economic=np.asarray(
            fp["MAX_MARGINAL_AGENT_ECONOMIC_INDEX"], np.float64
        ),
        min_marginal_planner_health=float(fp["MIN_MARGINAL_PLANNER_HEALTH_INDEX"]),
        max_marginal_planner_health=float(fp["MAX_MARGINAL_PLANNER_HEALTH_INDEX"]),
        min_marginal_planner_economic=float(
            fp["MIN_MARGINAL_PLANNER_ECONOMIC_INDEX"]
        ),
        max_marginal_planner_economic=float(
            fp["MAX_MARGINAL_PLANNER_ECONOMIC_INDEX"]
        ),
        real_world=real_world,
    )


def synthetic(n_states: int = 51, n_days: int = 518, seed: int = 0) -> CovidData:
    """Generate self-consistent synthetic artifacts with the reference schema.

    Not fitted to real data — for development, testing, and benchmarking.
    """
    rng = np.random.default_rng(seed)
    pop = rng.uniform(0.6e6, 39e6, n_states).round()
    us_pop = float(pop.sum())
    n_levels = 10
    num_filters = 5

    # Random-walk stringency policy in 1..10, starting at 1.
    policy = np.ones((n_days, n_states), np.int64)
    for t in range(1, n_days):
        step = rng.choice([-1, 0, 0, 0, 1], size=n_states)
        policy[t] = np.clip(policy[t - 1] + step, 1, n_levels)
        if t < 60:  # early ramp-up
            policy[t] = np.maximum(policy[t], np.minimum(t // 8 + 1, 6))

    # Simple SIR simulation to make S/I/R/V series self-consistent.
    gamma = 1.0 / 14
    mortality = 0.02
    beta_intercepts = rng.uniform(0.3, 0.5, n_states)
    beta_slopes = -rng.uniform(0.015, 0.03, n_states)
    S = pop.copy() - 100.0
    I = np.full(n_states, 100.0)
    R = np.zeros(n_states)
    V = np.zeros(n_states)
    sus, inf, rec, vac = [], [], [], []
    vax_start = 270
    for t in range(n_days):
        lag = max(0, t - 29)
        beta = np.maximum(beta_intercepts + beta_slopes * policy[lag], 0.01)
        new_inf = np.minimum(beta * S / pop * I, S)
        vaccinated = np.minimum(S, pop * 0.004) if t >= vax_start else 0.0
        dS = -new_inf - vaccinated
        dR = gamma * I + vaccinated
        dI = -dS - dR
        S = np.maximum(S + dS, 0)
        I = np.maximum(I + dI, 0)
        R = np.maximum(R + dR, 0)
        V = V + vaccinated
        sus.append(S.copy()); inf.append(I.copy()); rec.append(R.copy())
        vac.append(V.copy())
    sus, inf, rec, vac = map(np.asarray, (sus, inf, rec, vac))
    deaths = mortality * np.maximum(rec - vac, 0)

    unemployment_bias = rng.uniform(3.0, 6.0, n_states)
    conv_lambdas = np.array([10.0, 30.0, 60.0, 120.0, 240.0])
    weights = rng.uniform(0.01, 0.08, (n_states, num_filters))
    unemployed = (unemployment_bias + 0.7 * policy)[..., :] * pop / 100.0

    subsidy = np.zeros((n_days, 1))
    subsidy[30::90] = us_pop * 2000 / 4  # periodic stimulus rounds

    real_world = dict(
        policy=policy,
        subsidy=subsidy,
        susceptible=sus,
        infected=inf,
        recovered=rec,
        vaccinated=vac,
        deaths=deaths,
        smoothed_deaths=deaths,
        unemployment=unemployed / pop * 100,
        unemployed=unemployed,
        beta=np.zeros_like(sus),
    )
    return CovidData(
        us_state_population=pop,
        us_population=us_pop,
        gdp_per_capita=65300.0,
        num_stringency_levels=n_levels,
        sir_gamma=gamma,
        sir_mortality=mortality,
        state_names={str(i): f"State{i:02d}" for i in range(n_states)},
        beta_delay=29,
        beta_slopes=beta_slopes,
        beta_intercepts=beta_intercepts,
        policy_start_date="2020-01-01",
        filter_len=600,
        conv_lambdas=conv_lambdas,
        unemployment_bias=unemployment_bias,
        grouped_conv_weights=weights,
        value_of_life=1e7,
        inferred_weightage_agent_health=rng.uniform(0.5, 0.8, n_states),
        inferred_weightage_planner_health=0.757,
        min_marginal_agent_health=np.full(n_states, -0.01),
        max_marginal_agent_health=np.zeros(n_states),
        min_marginal_agent_economic=np.full(n_states, 0.002),
        max_marginal_agent_economic=np.full(n_states, 0.0035),
        min_marginal_planner_health=-0.0074,
        max_marginal_planner_health=-0.000145,
        min_marginal_planner_economic=0.00212,
        max_marginal_planner_economic=0.00271,
        real_world=real_world,
    )


def get_data(path_or_mode: str = "synthetic", **kwargs) -> CovidData:
    if path_or_mode == "synthetic":
        return synthetic(**kwargs)
    return load(path_or_mode)
