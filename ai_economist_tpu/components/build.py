"""Build: convert Wood+Stone into an owned House landmark, earning coin.

TPU-native rewrite of the reference Build component
(ai_economist/foundation/components/build.py:15-266). Since mobile agents
always occupy distinct tiles, builds can never conflict spatially, so the
reference's random-order loop (build.py:121-159) collapses to a fully
vectorised update — one of the places the TPU design is strictly simpler than
the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ai_economist_tpu.core import world as W
from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.state import EnvState


@component_registry.add
class Build(Component):
    name = "Build"
    shorthand = "Build"
    required_entities = ["Wood", "Stone", "Coin", "House", "Labor"]
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        payment=10,
        payment_max_skill_multiplier=1,
        skill_dist="none",
        build_labor=10.0,
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.payment = int(payment)
        self.payment_max_skill_multiplier = int(payment_max_skill_multiplier)
        self.build_labor = float(build_labor)
        self.skill_dist = skill_dist.lower()
        assert self.skill_dist in ("none", "pareto", "lognormal")
        self.resource_cost = {"Wood": 1, "Stone": 1}

    def n_actions(self, agent_cls_name):
        return 1 if agent_cls_name == "BasicMobileAgent" else None

    def agent_fields(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            return {"build_payment": float(self.payment), "build_skill": 1.0}
        return {}

    def init_state(self):
        n = self.n_agents
        return {
            "n_builds": jnp.zeros((n,), jnp.int32),
            # current-step build events (dense log, build.py:148-161)
            "ev_built": jnp.zeros((n,), jnp.bool_),
            "ev_loc": jnp.zeros((n, 2), jnp.int32),
            "ev_income": jnp.zeros((n,), jnp.float32),
        }

    # ------------------------------------------------------------------
    def reset(self, state: EnvState, key) -> EnvState:
        """Resample building skills (build.py:224-254)."""
        n = self.n_agents
        pmsm = float(self.payment_max_skill_multiplier)
        if self.skill_dist == "none":
            skill = jnp.ones((n,), jnp.float32)
            pay_rate = jnp.ones((n,), jnp.float32)
        elif self.skill_dist == "pareto":
            skill = jax.random.pareto(key, 4.0, (n,)) - 1.0
            pay_rate = jnp.minimum(pmsm, (pmsm - 1.0) * skill + 1.0)
        else:  # lognormal
            skill = jnp.exp(-1.0 + 0.5 * jax.random.normal(key, (n,)))
            pay_rate = jnp.minimum(pmsm, (pmsm - 1.0) * skill + 1.0)
        fields = dict(state.agent_fields)
        fields["build_payment"] = (pay_rate * self.payment).astype(jnp.float32)
        fields["build_skill"] = skill.astype(jnp.float32)
        return state.replace(
            agent_fields=fields,
            comp={**state.comp, self.name: self.init_state()},
        )

    # ------------------------------------------------------------------
    def _can_build(self, state: EnvState) -> jnp.ndarray:
        """[N] bool: resources available and the tile is clear
        (build.py:70-83). One-hot contraction instead of a per-agent gather
        (TPU gathers are ~0.5-2 ms/op at batch; see ai_economist_tpu/ops)."""
        spec = self.spec
        wood = state.inventory[:, spec.res_idx("Wood")]
        stone = state.inventory[:, spec.res_idx("Stone")]
        has_resources = (wood >= 1) & (stone >= 1)
        tile_sum = W.map_state(spec, state).sum(axis=0)  # any entity at tile
        pos = W.loc_one_hot(spec, state.loc)  # [N, H, W]
        tile_clear = (pos * tile_sum[None]).sum(axis=(1, 2)) == 0
        return has_resources & tile_clear

    def step(self, state: EnvState, a_actions, p_actions, key) -> EnvState:
        spec = self.spec
        acts = a_actions[self.name]  # [N] in {0, 1}
        do_build = (acts == 1) & self._can_build(state)
        b = do_build.astype(jnp.float32)

        inv = state.inventory
        inv = inv.at[:, spec.res_idx("Wood")].add(-b)
        inv = inv.at[:, spec.res_idx("Stone")].add(-b)
        inv = inv.at[:, spec.res_idx("Coin")].add(
            b * state.agent_fields["build_payment"]
        )
        endo = state.endogenous.at[:, spec.endo_idx("Labor")].add(
            b * self.build_labor
        )

        # Scatter-free house placement: agents stand on distinct tiles, so
        # summed one-hot outer products reproduce the per-agent scatters.
        pos = W.loc_one_hot(spec, state.loc)  # [N, H, W]
        built_here = (b[:, None, None] * pos).sum(axis=0)  # [H, W] 0/1
        maps = dict(state.maps)
        maps["House"] = jnp.maximum(maps["House"], built_here)
        ids = jnp.arange(self.n_agents, dtype=jnp.float32)[:, None, None]
        builder_id = (b[:, None, None] * ids * pos).sum(axis=0)
        maps["House__owner"] = jnp.where(
            built_here > 0.5,
            builder_id.astype(jnp.int32),
            maps["House__owner"],
        )

        comp = {
            **state.comp,
            self.name: {
                "n_builds": state.comp[self.name]["n_builds"]
                + do_build.astype(jnp.int32),
                "ev_built": do_build,
                "ev_loc": state.loc,
                "ev_income": b * state.agent_fields["build_payment"],
            },
        }
        return state.replace(inventory=inv, endogenous=endo, maps=maps, comp=comp)

    # ------------------------------------------------------------------
    def obs(self, state: EnvState):
        return {
            "a": {
                "build_payment": state.agent_fields["build_payment"] / self.payment,
                "build_skill": state.agent_fields["build_skill"],
            }
        }

    def masks(self, state: EnvState):
        return {"a": {self.name: self._can_build(state)[:, None].astype(jnp.float32)}}

    def dense_log_record(self, state: EnvState):
        cs = state.comp[self.name]
        return {"built": cs["ev_built"], "loc": cs["ev_loc"],
                "income": cs["ev_income"]}

    def decode_dense_log(self, stacked):
        """[T] list of build-event lists (reference build.py:148-161)."""
        import numpy as np

        built = np.asarray(stacked["built"])
        loc = np.asarray(stacked["loc"])
        income = np.asarray(stacked["income"])
        out = []
        for t in range(built.shape[0]):
            out.append([
                {"builder": int(i), "loc": loc[t, i].tolist(),
                 "income": float(income[t, i])}
                for i in np.nonzero(built[t])[0]
            ])
        return out

    def metrics(self, state: EnvState):
        out = {}
        nb = state.comp[self.name]["n_builds"]
        for i in range(self.n_agents):
            out[f"{i}/n_builds"] = nb[i]
        out["total_builds"] = (state.maps["House"] > 0).sum()
        return out
