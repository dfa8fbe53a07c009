"""SimpleLabor: choose hours worked; income = hours x skill.

TPU-native rewrite of ai_economist/foundation/components/simple_labor.py:15-134.
Skills are rank-averaged clipped Pareto samples computed once at build time
(simple_labor.py:74-80) — a deterministic host-side constant here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.state import EnvState


@component_registry.add
class SimpleLabor(Component):
    name = "SimpleLabor"
    required_entities = ["Coin"]
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        mask_first_step=True,
        payment_max_skill_multiplier=3,
        pareto_param=4.0,
        skill_seed=1234,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.num_labor_hours = 100
        self.mask_first_step = bool(mask_first_step)
        self.pareto_param = float(pareto_param)
        self.payment_max_skill_multiplier = float(payment_max_skill_multiplier)
        pmsm = self.payment_max_skill_multiplier
        rng = np.random.default_rng(skill_seed)
        samples = rng.pareto(self.pareto_param, size=(1000, self.n_agents))
        clipped = np.minimum(pmsm, (pmsm - 1) * samples + 1)
        self.skills = jnp.asarray(np.sort(clipped, axis=1).mean(axis=0), jnp.float32)

    def n_actions(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            return self.num_labor_hours
        return None

    def agent_fields(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            return {"skill": 0.0, "production": 0.0}
        return {}

    def reset(self, state: EnvState, key) -> EnvState:
        fields = dict(state.agent_fields)
        fields["skill"] = self.skills
        fields["production"] = jnp.zeros((self.n_agents,), jnp.float32)
        return state.replace(agent_fields=fields)

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        spec = self.spec
        hours = a_actions[self.name].astype(jnp.float32)  # [N] 0..100
        working = hours > 0
        payoff = hours * state.agent_fields["skill"]
        endo = state.endogenous.at[:, spec.endo_idx("Labor")].set(
            jnp.where(working, hours, state.endogenous[:, spec.endo_idx("Labor")])
        )
        inv = state.inventory.at[:, spec.res_idx("Coin")].add(
            jnp.where(working, payoff, 0.0)
        )
        fields = dict(state.agent_fields)
        fields["production"] = fields["production"] + jnp.where(working, payoff, 0.0)
        return state.replace(endogenous=endo, inventory=inv, agent_fields=fields)

    def obs(self, state: EnvState):
        return {
            "a": {
                "skill": state.agent_fields["skill"]
                / self.payment_max_skill_multiplier
            }
        }

    def masks(self, state: EnvState):
        """All labor masked on the episode's first decision (t == 0) when
        mask_first_step (simple_labor.py:97-103)."""
        ones = jnp.ones((self.n_agents, self.num_labor_hours), jnp.float32)
        if not self.mask_first_step:
            return {"a": {self.name: ones}}
        off = (state.t > 0).astype(jnp.float32)
        return {"a": {self.name: ones * off}}
