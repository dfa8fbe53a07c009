"""COVID-19 components: stringency control, federal subsidies, vaccination.

TPU-native rewrite of ai_economist/foundation/components/
covid19_components.py:38-663 and their CUDA twins
covid19_components_step.cu:10-262. All three operate on the covid scenario's
state (bound via `bind_covid`, mirroring how the reference exposes scenario
data through world attributes, covid19_env.py:218-234).
"""

from __future__ import annotations

from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.state import EnvState


@component_registry.add
class ControlUSStateOpenCloseStatus(Component):
    """Per-state stringency-level actions with an action cooldown
    (covid19_components.py:38-239)."""

    name = "ControlUSStateOpenCloseStatus"
    required_entities = []
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        n_stringency_levels=10,
        action_cooldown_period=28,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.n_stringency_levels = int(n_stringency_levels)
        assert self.n_stringency_levels >= 2
        self.action_cooldown_period = int(action_cooldown_period)
        self.scenario = None

    def bind_covid(self, scenario):
        self.scenario = scenario
        assert self.n_stringency_levels == scenario.num_stringency_levels, (
            "n_stringency_levels must match the fitted model "
            f"({scenario.num_stringency_levels})"
        )

    def n_actions(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            return self.n_stringency_levels
        return None

    def init_state(self):
        return {"cooldown_until": jnp.zeros((self.n_agents,), jnp.int32)}

    def reset(self, state: EnvState, key) -> EnvState:
        return state.replace(
            comp={**state.comp, self.name: self.init_state()}
        )

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        scen = dict(state.scen)
        cs = dict(state.comp[self.name])
        t = state.t
        hist = scen["hist"]
        prev_level = hist[-1]

        if self.scenario.use_real_world_policies:
            action = self.scenario.rw_policy[
                self.scenario.start_date_index + t - 1
            ]
            new_level = action
        else:
            action = a_actions[self.name].astype(jnp.float32)  # [N] 0..levels
            new_level = jnp.where(action == 0, prev_level, action)
            # Cooldown bookkeeping (covid19_components.py:211-222).
            at_decision = t == cs["cooldown_until"] + 1
            inc = jnp.where(
                action == 0, 1, self.action_cooldown_period
            ).astype(jnp.int32)
            cs["cooldown_until"] = jnp.where(
                at_decision, cs["cooldown_until"] + inc, cs["cooldown_until"]
            )

        # Push the new level into the stringency history ring.
        scen["hist"] = jnp.concatenate([hist[1:], new_level[None]], axis=0)
        return state.replace(
            scen=scen, comp={**state.comp, self.name: cs}
        )

    def obs(self, state: EnvState):
        level = state.scen["hist"][-1] / self.n_stringency_levels
        return {
            "a": {"agent_policy_indicators": level},
            "p": {"agent_policy_indicators": level},
        }

    def masks(self, state: EnvState):
        """Actions masked while in cooldown (covid19_components.py:97-108)."""
        if self.scenario.use_real_world_policies:
            m = jnp.ones((self.n_agents, self.n_stringency_levels), jnp.float32)
        else:
            cs = state.comp[self.name]
            free = state.t >= cs["cooldown_until"]  # [N]
            m = free[:, None].astype(jnp.float32) * jnp.ones(
                (1, self.n_stringency_levels), jnp.float32
            )
        return {"a": {self.name: m}}


@component_registry.add
class FederalGovernmentSubsidy(Component):
    """Planner subsidy levels rolled out daily per state
    (covid19_components.py:242-467)."""

    name = "FederalGovernmentSubsidy"
    required_entities = []
    agent_subclasses = ["BasicPlanner"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        subsidy_interval=90,
        num_subsidy_levels=20,
        max_annual_subsidy_per_person=20000,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.subsidy_interval = int(subsidy_interval)
        self.num_subsidy_levels = int(num_subsidy_levels)
        self.max_annual_subsidy_per_person = float(max_annual_subsidy_per_person)
        self.scenario = None

    def bind_covid(self, scenario):
        self.scenario = scenario
        self.max_daily_subsidy_per_state = (
            scenario.pop * self.max_annual_subsidy_per_person / 365.0
        )
        if scenario.use_real_world_policies:
            self._subsidy_amount_per_level = (
                scenario.data.us_population
                * self.max_annual_subsidy_per_person
                / self.num_subsidy_levels
                * self.subsidy_interval
                / 365.0
            )
            self.rw_subsidy = jnp.asarray(
                scenario.data.real_world["subsidy"][:, 0], jnp.float32
            )

    def n_actions(self, agent_cls_name):
        if agent_cls_name == "BasicPlanner":
            return self.num_subsidy_levels
        return None

    def init_state(self):
        st = {
            "current_subsidy_level": jnp.zeros((), jnp.float32),
            "total_subsidy": jnp.zeros(()),
        }
        if self.scenario is not None and self.scenario.use_real_world_policies:
            st["subsidy_level_array"] = jnp.zeros(
                (self.episode_length + 1,), jnp.float32
            )
        return st

    def reset(self, state: EnvState, key) -> EnvState:
        return state.replace(comp={**state.comp, self.name: self.init_state()})

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        scen = dict(state.scen)
        cs = dict(state.comp[self.name])
        t = state.t

        if self.scenario.use_real_world_policies:
            # Roll real subsidies over the interval (covid19_components.py:393-420).
            sidx = self.scenario.start_date_index + t - 1
            amount = self.rw_subsidy[sidx]
            level = jnp.round(amount / self._subsidy_amount_per_level)
            ts = jnp.arange(self.episode_length + 1)
            window = (ts >= t - 1) & (ts < t - 1 + self.subsidy_interval)
            arr = cs["subsidy_level_array"] + jnp.where(
                amount > 0, level, 0.0
            ) * window.astype(jnp.float32)
            cs["subsidy_level_array"] = arr
            subsidy_level = arr[t - 1]
        else:
            on_interval = (t - 1) % self.subsidy_interval == 0
            # The planner action may arrive as a length-1 subspace array;
            # keep the component state scalar (matches init_state).
            act = jnp.asarray(p_actions[self.name]).reshape(()).astype(jnp.float32)
            subsidy_level = jnp.where(
                on_interval, act, cs["current_subsidy_level"]
            )
        cs["current_subsidy_level"] = jnp.asarray(subsidy_level).reshape(())

        frac = subsidy_level / self.num_subsidy_levels
        daily = frac * self.max_daily_subsidy_per_state
        scen["subsidy"] = daily
        cs["total_subsidy"] = cs["total_subsidy"] + daily.sum()
        return state.replace(scen=scen, comp={**state.comp, self.name: cs})

    def obs(self, state: EnvState):
        cs = state.comp[self.name]
        t_since = state.t % self.subsidy_interval
        t_until = (self.subsidy_interval - t_since).astype(jnp.float32)
        lvl = cs["current_subsidy_level"] / self.num_subsidy_levels
        n = self.n_agents
        return {
            "a": {
                "t_until_next_subsidy": jnp.full(
                    (n,), t_until / self.subsidy_interval
                ),
                "current_subsidy_level": jnp.full((n,), lvl),
            },
            "p": {
                "t_until_next_subsidy": t_until / self.subsidy_interval,
                "current_subsidy_level": lvl,
            },
        }

    def masks(self, state: EnvState):
        """Subsidy actions only at interval starts
        (covid19_components.py:316-325)."""
        if self.scenario.use_real_world_policies:
            m = jnp.ones((self.num_subsidy_levels,), jnp.float32)
        else:
            on = (state.t % self.subsidy_interval == 0).astype(jnp.float32)
            m = jnp.full((self.num_subsidy_levels,), 1.0) * on
        return {"p": {self.name: m}}


@component_registry.add
class VaccinationCampaign(Component):
    """Passive vaccine deliveries after a start date
    (covid19_components.py:470-663)."""

    name = "VaccinationCampaign"
    required_entities = []
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        daily_vaccines_per_million_people=4500,
        delivery_interval=1,
        vaccine_delivery_start_date="2020-12-22",
        observe_rate=False,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.daily_vaccines_per_million_people = int(daily_vaccines_per_million_people)
        self.delivery_interval = int(delivery_interval)
        self.vaccine_delivery_start_date = datetime.strptime(
            vaccine_delivery_start_date, "%Y-%m-%d"
        )
        self.observe_rate = bool(observe_rate)
        self.scenario = None

    def bind_covid(self, scenario):
        self.scenario = scenario
        millions = scenario.data.us_state_population / 1e6
        self.num_vaccines_per_delivery = jnp.asarray(
            np.floor(
                self.delivery_interval
                * millions
                * self.daily_vaccines_per_million_people
            ),
            jnp.float32,
        )
        self.t_delivery_begins = (
            self.vaccine_delivery_start_date - scenario.start_date
        ).days
        t = int(self.t_delivery_begins)
        while t % self.delivery_interval != 0:
            t += 1
        self._t_first_delivery = t

    def n_actions(self, agent_cls_name):
        return None

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        scen = dict(state.scen)
        t = state.t
        deliver = (t >= self.t_delivery_begins) & (
            t % self.delivery_interval == 0
        )
        scen["vaccines_available"] = scen["vaccines_available"] + jnp.where(
            deliver, self.num_vaccines_per_delivery, 0.0
        )
        return state.replace(scen=scen)

    def obs(self, state: EnvState):
        """Countdown to next delivery (covid19_components.py:629-663)."""
        next_t = state.t + 1
        before_first = next_t <= self._t_first_delivery
        t_until_pre = jnp.minimum(
            1.0,
            (self._t_first_delivery - next_t).astype(jnp.float32)
            / self.delivery_interval,
        )
        t_since = next_t % self.delivery_interval
        t_until_post = (self.delivery_interval - t_since).astype(jnp.float32)
        t_until = jnp.where(before_first, t_until_pre, t_until_post)
        rate = jnp.where(
            before_first, 0.0, self.daily_vaccines_per_million_people / 1e6
        )
        n = self.n_agents
        out = {
            "a": {
                "t_until_next_vaccines": jnp.full(
                    (n,), t_until / self.delivery_interval
                )
            },
            "p": {"t_until_next_vaccines": t_until / self.delivery_interval},
        }
        if self.observe_rate:
            out["a"]["next_vaccination_rate"] = jnp.full((n,), rate)
            out["p"]["next_vaccination_rate"] = rate
        return out
