"""OneStepEconomy: 2-step tax-design benchmark scenario.

TPU-native rewrite of ai_economist/foundation/scenarios/one_step_economy/
one_step_economy.py:13-336: step 1 the planner sets taxes
(PeriodicBracketTax), step 2 agents choose labor (SimpleLabor).
"""

from __future__ import annotations

import jax.numpy as jnp

from ai_economist_tpu.core.scenario import Scenario, scenario_registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.scenarios.utils import rewards, social_metrics


@scenario_registry.add
class OneStepEconomy(Scenario):
    name = "one-step-economy"
    agent_subclasses = ["BasicMobileAgent", "BasicPlanner"]
    required_entities = ["Coin"]

    def __init__(
        self,
        spec,
        components,
        env,
        agent_reward_type="coin_minus_labor_cost",
        isoelastic_eta=0.23,
        labor_exponent=2.0,
        labor_cost=1.0,
        planner_reward_type="inv_income_weighted_utility",
        mixing_weight_gini_vs_coin=0,
        planner_starting_coin=0,
    ):
        super().__init__(spec, components, env)
        self.agent_reward_type = agent_reward_type
        self.isoelastic_eta = float(isoelastic_eta)
        self.labor_exponent = float(labor_exponent)
        self.labor_cost = float(labor_cost)
        self.planner_reward_type = planner_reward_type
        self.mixing_weight_gini_vs_coin = float(mixing_weight_gini_vs_coin)
        self.planner_starting_coin = float(planner_starting_coin)

    def init_scen_state(self):
        return {
            "curr_metric_a": jnp.zeros((self.n_agents,), jnp.float32),
            "curr_metric_p": jnp.zeros((), jnp.float32),
        }

    def reset_layout(self, state: EnvState, key) -> EnvState:
        return state

    def reset_agent_states(self, state: EnvState, key) -> EnvState:
        spec = self.spec
        p_inv = jnp.zeros_like(state.p_inventory).at[spec.res_idx("Coin")].set(
            self.planner_starting_coin
        )
        return state.replace(
            inventory=jnp.zeros_like(state.inventory),
            escrow=jnp.zeros_like(state.escrow),
            endogenous=jnp.zeros_like(state.endogenous),
            p_inventory=p_inv,
            p_escrow=jnp.zeros_like(state.p_escrow),
        )

    def additional_reset(self, state: EnvState, key) -> EnvState:
        m_a, m_p = self._optimization_metrics(state)
        scen = dict(state.scen)
        scen.update(curr_metric_a=m_a, curr_metric_p=m_p)
        return state.replace(scen=scen)

    def _optimization_metrics(self, state: EnvState):
        spec = self.spec
        coin = state.total_endowment(spec.res_idx("Coin"))
        labor = state.endogenous[:, spec.endo_idx("Labor")]
        production = state.agent_fields.get(
            "production", jnp.zeros((self.n_agents,))
        )
        if self.agent_reward_type == "isoelastic_coin_minus_labor":
            m_a = rewards.isoelastic_coin_minus_labor(
                coin, labor, self.isoelastic_eta, self.labor_cost
            )
        elif self.agent_reward_type == "coin_minus_labor_cost":
            m_a = rewards.coin_minus_labor_cost(
                coin, labor, self.labor_exponent, self.labor_cost
            )
        else:
            raise NotImplementedError(self.agent_reward_type)
        if self.planner_reward_type == "coin_eq_times_productivity":
            m_p = rewards.coin_eq_times_productivity(
                coin, 1.0 - self.mixing_weight_gini_vs_coin
            )
        elif self.planner_reward_type == "inv_income_weighted_utility":
            # Weighted by pre-tax incomes (one_step_economy.py:324-332).
            m_p = rewards.inv_income_weighted_utility(production, m_a)
        else:
            raise NotImplementedError(self.planner_reward_type)
        return m_a.astype(jnp.float32), m_p.astype(jnp.float32)

    def obs(self, state: EnvState):
        spec = self.spec
        coin = state.total_endowment(spec.res_idx("Coin"))
        equality = social_metrics.get_equality(coin)
        productivity = social_metrics.get_productivity(coin)
        p_obs = {
            "normalized_per_capita_productivity":
                productivity / self.n_agents / 1000.0,
            "equality": equality,
        }
        return {"a": {}, "p": p_obs, "pa": {}}

    def reward(self, state: EnvState):
        m_a, m_p = self._optimization_metrics(state)
        rew_a = m_a - state.scen["curr_metric_a"]
        rew_p = m_p - state.scen["curr_metric_p"]
        scen = dict(state.scen)
        scen.update(curr_metric_a=m_a, curr_metric_p=m_p)
        return state.replace(scen=scen), {"a": rew_a, "p": rew_p}

    def metrics(self, state: EnvState):
        spec = self.spec
        coin = state.total_endowment(spec.res_idx("Coin"))
        production = state.agent_fields.get(
            "production", jnp.zeros((self.n_agents,))
        )
        util = state.scen["curr_metric_a"]
        out = {
            "social/productivity": social_metrics.get_productivity(coin),
            "social/equality": social_metrics.get_equality(coin),
            "social_welfare/coin_eq_times_productivity":
                rewards.coin_eq_times_productivity(coin, 1.0),
            "social_welfare/inv_income_weighted_utility":
                rewards.inv_income_weighted_utility(production, util),
            "util/avg_agent": util.mean(),
            "util/p": state.scen["curr_metric_p"],
        }
        for r in spec.resources:
            out[f"endow/avg_agent/{r}"] = state.total_endowment(
                spec.res_idx(r)
            ).mean()
            out[f"endow/p/{r}"] = state.p_inventory[spec.res_idx(r)]
        for e in spec.endogenous:
            out[f"endogenous/avg_agent/{e}"] = state.endogenous[
                :, spec.endo_idx(e)
            ].mean()
        return out
