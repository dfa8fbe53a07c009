"""CovidAndEconomySimulation: US-state SIR epidemic + economy, TPU-native.

Rewrite of ai_economist/foundation/scenarios/covid19/covid19_env.py:39-1687
and its CUDA twin covid19_env_step.cu:274-619 as pure jnp state transitions:
51 US-state agents set stringency policies, the federal planner provides
subsidies; SIR dynamics respond to (29-day-lagged) stringency via fitted
linear beta models; unemployment responds through a bank of exponential
filters over stringency *changes*; productivity falls with
infection/death/unemployment; rewards blend normalized health and economic
indices per fitted weightages.

State layout is already SoA in the reference CUDA ([T+1, 51] time series per
env); here we carry only what the dynamics need — a rolling stringency
history [filter_len+1, N] plus current SIR/economy vectors and episode
accumulators — so thousands of replicas fit in HBM.
"""

from __future__ import annotations

from datetime import datetime
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.scenario import Scenario, scenario_registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.scenarios.covid19 import data as covid_data


def _softplus(x):
    # torch-style softplus with linear tail past threshold 20
    return jnp.where(x <= 20.0, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))), x)


@scenario_registry.add
class CovidAndEconomySimulation(Scenario):
    name = "CovidAndEconomySimulation"
    agent_subclasses = ["BasicMobileAgent", "BasicPlanner"]
    required_entities = []

    def __init__(
        self,
        spec,
        components,
        env,
        use_real_world_data=False,
        use_real_world_policies=False,
        path_to_data_and_fitted_params="synthetic",
        start_date="2020-03-22",
        pop_between_age_18_65=0.6,
        infection_too_sick_to_work_rate=0.1,
        risk_free_interest_rate=0.03,
        economic_reward_crra_eta=2,
        health_priority_scaling_agents=1,
        health_priority_scaling_planner=1,
        reward_normalization_factor=1,
        n_states_synthetic=None,
    ):
        super().__init__(spec, components, env)
        self.use_real_world_data = bool(use_real_world_data)
        self.use_real_world_policies = bool(use_real_world_policies)
        if self.use_real_world_data:
            assert self.use_real_world_policies

        if path_to_data_and_fitted_params == "synthetic":
            self.data = covid_data.synthetic(
                n_states=n_states_synthetic or spec.n_agents
            )
        else:
            self.data = covid_data.load(path_to_data_and_fitted_params)
        d = self.data
        assert spec.n_agents == d.n_states, (
            f"n_agents must equal the number of states in the data ({d.n_states})"
        )
        self.num_stringency_levels = d.num_stringency_levels
        self.death_rate = d.sir_mortality
        self.gamma = d.sir_gamma
        self.beta_delay = d.beta_delay
        self.filter_len = d.filter_len

        self.start_date = datetime.strptime(start_date, covid_data.DATE_FORMAT)
        policy_start = datetime.strptime(
            d.policy_start_date, covid_data.DATE_FORMAT
        )
        self.start_date_index = (self.start_date - policy_start).days
        assert 0 <= self.start_date_index < len(d.real_world["policy"])
        if self.use_real_world_policies:
            avail = len(d.real_world["policy"]) - self.start_date_index
            assert env.episode_length <= avail

        N = d.n_states
        # --- unemployment model precompute (covid19_env.py:240-255) ---
        f_ts = np.flip(np.arange(d.filter_len))  # [L]
        self._np_filters = np.exp(
            -f_ts[None, :] / d.conv_lambdas[:, None]
        )  # [F, L]
        self.unemp_filters = jnp.asarray(self._np_filters, jnp.float32)
        self.conv_weights = jnp.asarray(d.grouped_conv_weights, jnp.float32)  # [N, F]
        self.unemployment_bias = jnp.asarray(d.unemployment_bias, jnp.float32)
        self.pop = jnp.asarray(d.us_state_population, jnp.float32)

        # --- GDP calibration (covid19_env.py:263-304) ---
        # Unemployment at all-ones stringency: zero deltas -> softplus(0).
        excess0 = np.log(2.0)
        unemployed_1 = (excess0 + d.unemployment_bias) * d.us_state_population / 100
        self._np_unemployed_1 = unemployed_1
        workforce = int(
            d.us_population * pop_between_age_18_65 - unemployed_1.sum()
        )
        workers_per_capita = workforce / d.us_population
        gdp_per_worker = d.gdp_per_capita / workers_per_capita
        self.num_days_in_an_year = 365
        self.daily_production_per_worker = gdp_per_worker / 365.0

        self.infection_too_sick_to_work_rate = float(infection_too_sick_to_work_rate)
        self.pop_between_age_18_65 = float(pop_between_age_18_65)
        self.risk_free_interest_rate = float(risk_free_interest_rate)
        self.economic_reward_crra_eta = float(economic_reward_crra_eta)
        self.reward_normalization_factor = float(reward_normalization_factor)

        max_prod = self._economy_np(
            d.us_state_population, np.zeros(N), np.zeros(N), unemployed_1
        )
        self.maximum_productivity = jnp.asarray(max_prod, jnp.float32)
        self.agents_health_norm = jnp.asarray(max_prod * 365.0, jnp.float32)
        self.planner_health_norm = float((max_prod * 365.0).sum())
        self.agents_economic_norm = self.agents_health_norm
        self.planner_economic_norm = self.planner_health_norm

        def scale_alpha(scaling, alphas):
            z = alphas / (1 - alphas)
            return scaling * z / (1 + scaling * z)

        self.w_agent_health = jnp.asarray(
            scale_alpha(
                health_priority_scaling_agents, d.inferred_weightage_agent_health
            ),
            jnp.float32,
        )
        self.w_agent_econ = 1.0 - self.w_agent_health
        self.w_planner_health = float(
            scale_alpha(
                health_priority_scaling_planner,
                d.inferred_weightage_planner_health,
            )
        )
        self.w_planner_econ = 1.0 - self.w_planner_health

        # Device copies of fitted params / real-world series
        self.beta_slopes = jnp.asarray(d.beta_slopes, jnp.float32)
        self.beta_intercepts = jnp.asarray(d.beta_intercepts, jnp.float32)
        rw = d.real_world
        self.rw_policy = jnp.asarray(rw["policy"], jnp.float32)
        if self.use_real_world_data:
            for k in ("susceptible", "infected", "recovered", "vaccinated",
                      "deaths", "unemployed"):
                setattr(self, f"rw_{k}", jnp.asarray(rw[k], jnp.float32))

        # Let covid components bind to this scenario (the reference exposes
        # these via world attributes, covid19_env.py:218-234).
        for c in components:
            if hasattr(c, "bind_covid"):
                c.bind_covid(self)

    # ------------------------------------------------------------------
    def _economy_np(self, population, infected, deaths, unemployed):
        incap = self.infection_too_sick_to_work_rate * infected + deaths
        cant_work = incap * self.pop_between_age_18_65 + unemployed
        workers = population * self.pop_between_age_18_65
        can_work = np.maximum(0, workers - cant_work)
        return can_work * self.daily_production_per_worker

    def economy_step(self, infected, deaths, unemployed):
        """Daily productivity (covid19_env.py:1444-1475)."""
        incap = self.infection_too_sick_to_work_rate * infected + deaths
        cant_work = incap * self.pop_between_age_18_65 + unemployed
        workers = self.pop * self.pop_between_age_18_65
        can_work = jnp.maximum(0.0, workers - cant_work)
        return can_work * self.daily_production_per_worker

    def unemployment_step(self, hist):
        """Unemployment from stringency-change filter responses
        (covid19_env.py:1374-1441)."""
        deltas = hist[1:] - hist[:-1]  # [L, N]
        responses = jnp.einsum(
            "fl,ln->fn", self.unemp_filters, deltas
        )  # [F, N]
        excess = _softplus((self.conv_weights.T * responses).sum(axis=0))
        rate = excess + self.unemployment_bias
        return rate * self.pop / 100.0

    def sir_step(self, S, I, lagged_stringency, vaccines):
        """SIR deltas (covid19_env.py:1477-1515)."""
        beta = self.beta_intercepts + self.beta_slopes * lagged_stringency
        frac_vacc = jnp.minimum(1.0, vaccines / (S + 1e-10))
        vaccinated_t = jnp.minimum(vaccines, S)
        dS = -beta * (S / self.pop) * I * (1.0 - frac_vacc) - vaccinated_t
        dR = self.gamma * I + vaccinated_t
        dI = -dS - dR
        return dS, dI, dR, vaccinated_t

    # ------------------------------------------------------------------
    def init_scen_state(self):
        N, L = self.spec.n_agents, self.filter_len
        z = jnp.zeros((N,), jnp.float32)
        return {
            "hist": jnp.ones((L + 1, N), jnp.float32),
            "S": z, "I": z, "R": z, "D": z, "V": z, "U": z,
            "D_prev": z,
            "subsidy": z,
            "postsubsidy_productivity": z,
            "vaccines_available": z,
            "total_vaccinated_delivered": z,
            "health_index_a": z,
            "economic_index_a": z,
            "health_index_p": jnp.zeros(()),
            "economic_index_p": jnp.zeros(()),
            "sum_unemployed": z,
            "sum_stringency": z,
            "sum_productivity": z,
            "sum_subsidy": z,
        }

    def reset_layout(self, state: EnvState, key) -> EnvState:
        return state

    def reset_agent_states(self, state: EnvState, key) -> EnvState:
        return state

    def additional_reset(self, state: EnvState, key) -> EnvState:
        """Initialize from real-world series at start date
        (covid19_env.py:1174-1293)."""
        d = self.data
        si = self.start_date_index
        rw = d.real_world
        N, L = d.n_states, self.filter_len

        sus0 = jnp.asarray(rw["susceptible"][si], jnp.float32)
        inf0 = jnp.asarray(rw["infected"][si], jnp.float32)
        rec0 = jnp.asarray(rw["recovered"][si], jnp.float32)
        dth0 = rec0 * self.death_rate
        une0 = jnp.asarray(rw["unemployed"][si], jnp.float32)
        vac0 = jnp.asarray(rw["vaccinated"][si], jnp.float32)

        hist_np = np.pad(
            np.asarray(rw["policy"][: si + 1], np.float32),
            [(L, 0), (0, 0)],
            constant_values=1,
        )[-(L + 1):]

        scen = self.init_scen_state()
        scen.update(
            hist=jnp.asarray(hist_np),
            S=sus0, I=inf0, R=rec0, D=dth0, V=vac0, U=une0,
            D_prev=dth0,
        )
        return state.replace(scen=scen)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, key) -> EnvState:
        """SIR -> unemployment -> economy -> subsidy application
        (covid19_env.py:726-917)."""
        scen = dict(state.scen)
        t = state.t
        L = self.filter_len

        # Current stringency was pushed into hist by the control component.
        hist = scen["hist"]
        current_level = hist[-1]
        lagged = hist[L - self.beta_delay]

        if self.use_real_world_data:
            idx = self.start_date_index + t
            S = jnp.maximum(self.rw_susceptible[idx], 0)
            I = jnp.maximum(self.rw_infected[idx], 0)
            R = jnp.maximum(self.rw_recovered[idx], 0)
            V = jnp.maximum(self.rw_vaccinated[idx], 0)
            D = jnp.maximum(self.rw_deaths[idx], 0)
            U = self.rw_unemployed[idx]
        else:
            vaccines = scen["vaccines_available"]
            dS, dI, dR, dV = self.sir_step(scen["S"], scen["I"], lagged, vaccines)
            S = jnp.maximum(scen["S"] + dS, 0)
            I = jnp.maximum(scen["I"] + dI, 0)
            R = jnp.maximum(scen["R"] + dR, 0)
            V = jnp.maximum(scen["V"] + dV, 0)
            D = self.death_rate * (R - V)
            U = self.unemployment_step(hist)
            scen["total_vaccinated_delivered"] = (
                scen["total_vaccinated_delivered"] + vaccines
            )
            scen["vaccines_available"] = jnp.zeros_like(vaccines)

        productivity = self.economy_step(I, D, U)
        postsubsidy = productivity + scen["subsidy"]

        scen.update(
            D_prev=scen["D"],
            S=S, I=I, R=R, D=D, V=V, U=U,
            postsubsidy_productivity=postsubsidy,
            sum_unemployed=scen["sum_unemployed"] + U,
            sum_stringency=scen["sum_stringency"] + current_level,
            sum_productivity=scen["sum_productivity"] + postsubsidy,
            sum_subsidy=scen["sum_subsidy"] + scen["subsidy"],
        )
        return state.replace(scen=scen)

    # ------------------------------------------------------------------
    def obs(self, state: EnvState):
        """Normalized SIR/economy observations (covid19_env.py:921-995)."""
        scen = state.scen
        L = self.filter_len
        redux = jnp.stack(
            [scen[k] for k in ("S", "I", "R", "D", "V", "U")], axis=1
        )  # [N, 6]
        norm_state = redux / self.pop[:, None]
        norm_prod = scen["postsubsidy_productivity"] / self.maximum_productivity
        lagged = scen["hist"][L - self.beta_delay + 1]
        norm_lagged = lagged / self.num_stringency_levels
        n = self.n_agents
        a_obs = {
            "agent_index": jnp.eye(n, dtype=jnp.float32),
            "agent_state": norm_state,
            "agent_postsubsidy_productivity": norm_prod,
            "lagged_stringency_level": norm_lagged,
        }
        p_obs = {
            "agent_state": norm_state.T.reshape(-1),
            "agent_postsubsidy_productivity": norm_prod,
            "lagged_stringency_level": norm_lagged,
        }
        return {"a": a_obs, "p": p_obs, "pa": {}}

    # ------------------------------------------------------------------
    def _crra(self, x):
        eta = self.economic_reward_crra_eta
        annual = jnp.clip(self.num_days_in_an_year * x, 0.1, 3.0)
        annual_crra = 1.0 + (annual ** (1.0 - eta) - 1.0) / (1.0 - eta)
        return annual_crra / self.num_days_in_an_year

    @staticmethod
    def _minmax(x, lo, hi):
        return (x - lo) / (hi - lo + 1e-10)

    def reward(self, state: EnvState):
        """Weighted normalized health/economic indices
        (covid19_env.py:1046-1173)."""
        d = self.data
        scen = dict(state.scen)
        marginal_deaths = scen["D"] - scen["D_prev"]
        post_prod = scen["postsubsidy_productivity"]

        h_a = -marginal_deaths * d.value_of_life / self.agents_health_norm
        e_a = self._crra(post_prod / self.agents_economic_norm)
        h_a = self._minmax(
            h_a,
            jnp.asarray(d.min_marginal_agent_health, jnp.float32),
            jnp.asarray(d.max_marginal_agent_health, jnp.float32),
        )
        e_a = self._minmax(
            e_a,
            jnp.asarray(d.min_marginal_agent_economic, jnp.float32),
            jnp.asarray(d.max_marginal_agent_economic, jnp.float32),
        )
        rew_a = (
            self.w_agent_health * h_a + self.w_agent_econ * e_a
        ) / (self.w_agent_health + self.w_agent_econ)

        h_p = (
            -marginal_deaths.sum() * d.value_of_life / self.planner_health_norm
        )
        cost_of_subsidy = (1.0 + self.risk_free_interest_rate) * scen["subsidy"].sum()
        e_p = self._crra(
            (post_prod.sum() - cost_of_subsidy) / self.planner_economic_norm
        )
        h_p = self._minmax(
            h_p, d.min_marginal_planner_health, d.max_marginal_planner_health
        )
        e_p = self._minmax(
            e_p, d.min_marginal_planner_economic, d.max_marginal_planner_economic
        )
        rew_p = (
            self.w_planner_health * h_p + self.w_planner_econ * e_p
        ) / (self.w_planner_health + self.w_planner_econ)

        scen.update(
            health_index_a=scen["health_index_a"] + h_a,
            economic_index_a=scen["economic_index_a"] + e_a,
            health_index_p=scen["health_index_p"] + h_p,
            economic_index_p=scen["economic_index_p"] + e_p,
        )
        norm = self.reward_normalization_factor
        return state.replace(scen=scen), {
            "a": (rew_a / norm).astype(jnp.float32),
            "p": (rew_p / norm).astype(jnp.float32),
        }

    # ------------------------------------------------------------------
    def metrics(self, state: EnvState):
        """Per-state + national end-of-episode metrics
        (covid19_env.py:1613-1687)."""
        d = self.data
        scen = state.scen
        t = jnp.maximum(state.t.astype(jnp.float32), 1.0)
        out = {}
        for i in range(min(self.n_agents, 60)):
            name = d.state_names.get(str(i), f"state{i}")
            out[f"{name}/infected (millions)"] = scen["I"][i] / 1e6
            out[f"{name}/recovered (millions)"] = scen["R"][i] / 1e6
            out[f"{name}/deaths (millions)"] = scen["D"][i] / 1e6
            out[f"{name}/mean_unemployment_rate (%)"] = (
                scen["sum_unemployed"][i] / t / self.pop[i] * 100.0
            )
            out[f"{name}/mean_open_close_stringency_level"] = (
                scen["sum_stringency"][i] / t
            )
            out[f"{name}/total_productivity (billion $)"] = (
                scen["sum_productivity"][i] / 1e9
            )
            out[f"{name}/health_index_at_end_of_episode"] = scen["health_index_a"][i]
            out[f"{name}/economic_index_at_end_of_episode"] = (
                scen["economic_index_a"][i]
            )
        out["usa/vaccinated (% of population)"] = (
            scen["V"].sum() / d.us_population * 100.0
        )
        out["usa/deaths (thousands)"] = scen["D"].sum() / 1e3
        out["usa/mean_unemployment_rate (%)"] = (
            scen["sum_unemployed"].sum(axis=0) / t / d.us_population * 100.0
        )
        out["usa/total_amount_subsidized (trillion $)"] = (
            scen["sum_subsidy"].sum() / 1e12
        )
        out["usa/total_productivity (trillion $)"] = (
            scen["sum_productivity"].sum() / 1e12
        )
        out["usa/health_index_at_end_of_episode"] = scen["health_index_p"]
        out["usa/economic_index_at_end_of_episode"] = scen["economic_index_p"]
        return out
