"""Gather: movement + resource collection for mobile agents.

TPU-native rewrite of the reference Gather component
(ai_economist/foundation/components/move.py:16-222). The reference resolves
movement conflicts by iterating agents in a random order and letting earlier
agents block later ones (move.py:104-153, world.py:418-422). We reproduce
those exact semantics with a `lax.scan` over a randomly permuted agent index:
each scan step moves one agent against the current occupancy, then collects
resources at its final tile. With n_agents ~ 4-16 the scan is short and the
whole thing vmaps cleanly over thousands of envs.

Action subspace (mobile agents): 4 actions — 1=Left, 2=Right, 3=Up, 4=Down
(move.py:115-123). 0 = NO-OP (stand still; still collects underfoot,
move.py:136-142).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ai_economist_tpu.core import world as W
from ai_economist_tpu.core.component import Component, component_registry
from ai_economist_tpu.core.state import EnvState


from ai_economist_tpu.ops import uniform_permutation


@component_registry.add
class Gather(Component):
    name = "Gather"
    required_entities = ["Coin", "House", "Labor"]
    agent_subclasses = ["BasicMobileAgent"]

    def __init__(
        self,
        spec,
        episode_length,
        inventory_scale=1.0,
        move_labor=1.0,
        collect_labor=1.0,
        skill_dist="none",
    ):
        super().__init__(spec, episode_length, inventory_scale)
        self.move_labor = float(move_labor)
        self.collect_labor = float(collect_labor)
        self.skill_dist = skill_dist.lower()
        assert self.skill_dist in ("none", "pareto", "lognormal")
        assert self.move_labor >= 0 and self.collect_labor >= 0

    def n_actions(self, agent_cls_name):
        return 4 if agent_cls_name == "BasicMobileAgent" else None

    def init_state(self):
        # Current-step gather events (dense log, move.py:136-153):
        # units gathered per (agent, collectible) at the agent's final tile.
        C = len(self.spec.collectibles)
        return {"ev_gathered": jnp.zeros((self.n_agents, C), jnp.float32)}

    def agent_fields(self, agent_cls_name):
        if agent_cls_name == "BasicMobileAgent":
            return {"bonus_gather_prob": 0.0}
        return {}

    # ------------------------------------------------------------------
    def reset(self, state: EnvState, key) -> EnvState:
        """Resample collection skills (move.py:193-210)."""
        n = self.n_agents
        if self.skill_dist == "none":
            bonus = jnp.zeros((n,), jnp.float32)
        elif self.skill_dist == "pareto":
            # numpy's pareto(a) is Lomax: pareto_I(a) - 1.
            samples = jax.random.pareto(key, 3.0, (n,)) - 1.0
            bonus = jnp.minimum(2.0, samples) / 2.0
        else:  # lognormal
            samples = jnp.exp(-2.022 + 0.938 * jax.random.normal(key, (n,)))
            bonus = jnp.minimum(2.0, samples) / 2.0
        fields = dict(state.agent_fields)
        fields["bonus_gather_prob"] = bonus.astype(jnp.float32)
        return state.replace(agent_fields=fields)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, a_actions, p_actions, key, draws=None) -> EnvState:
        """One Gather step.

        `draws` (parity injection): {"order": [N] int32 agent permutation,
        "bonus": [N, C] float32 uniforms in collectible order} — the draws the
        reference consumes as np.random.permutation (world.py:418-422) and one
        rand() per gather event (move.py:138).
        """
        spec = self.spec
        n = self.n_agents
        H, Wd = spec.height, spec.width
        acts = a_actions[self.name]  # [N] int32 in 0..4
        lab_i = spec.endo_idx("Labor")
        colls = spec.collectibles
        res_cols = jnp.array([spec.res_idx(r) for r in colls], jnp.int32)

        if draws is not None:
            order = jnp.asarray(draws["order"], jnp.int32)
            bonus_draws = jnp.asarray(draws["bonus"], jnp.float32)
        else:
            k_perm, k_bonus = jax.random.split(key)
            # Sort-free (jax.random.permutation lowers to a ~2 ms XLA sort).
            order = uniform_permutation(k_perm, n)
            # One bonus-collection coin flip per (agent, collectible) per step.
            bonus_draws = jax.random.uniform(k_bonus, (n, len(colls)))

        access = W.accessibility(spec, state)  # [N, H, W] (static this step)
        res_stack = jnp.stack([state.maps[r] for r in colls])  # [C, H, W]
        occ = W.occupancy_map(spec, state.loc)

        # Row/col deltas for actions 0..4 (0 = stay).
        droff = jnp.array([0, 0, 0, -1, 1], jnp.int32)
        dcoff = jnp.array([0, -1, 1, 0, 0], jnp.int32)
        # Static collectible-column projection [C, R]: keeps the inventory
        # update elementwise instead of a scatter.
        col_proj_np = [[0.0] * spec.n_resources for _ in colls]
        for j, rname in enumerate(colls):
            col_proj_np[j][spec.res_idx(rname)] = 1.0
        col_proj = jnp.asarray(col_proj_np)

        # The body is pure one-hot arithmetic: batched dynamic gathers and
        # scatters inside a vmapped scan each cost ~0.5-2 ms per op at
        # 4096-env batch on TPU, while the equivalent one-hot outer products
        # over the (tiny) [N, H, W] grids fuse into a few elementwise
        # kernels (see ai_economist_tpu/ops docstring for measurements).
        def body(carry, i):
            loc, res, occ, inv, endo, gn = carry
            sel = jax.nn.one_hot(i, n)  # [N] float, this agent
            selb = sel > 0.5
            fsel = lambda x: jnp.sum(sel * x.astype(jnp.float32)).astype(jnp.int32)
            a = fsel(acts)
            r = fsel(loc[:, 0])
            c = fsel(loc[:, 1])
            a_oh = jax.nn.one_hot(a, 5)
            nr = r + jnp.sum(a_oh * droff).astype(jnp.int32)
            nc = c + jnp.sum(a_oh * dcoff).astype(jnp.int32)
            in_bounds = (nr >= 0) & (nr < H) & (nc >= 0) & (nc < Wd)
            nr_c = jnp.clip(nr, 0, H - 1)
            nc_c = jnp.clip(nc, 0, Wd - 1)
            old_oh = jax.nn.one_hot(r, H)[:, None] * jax.nn.one_hot(c, Wd)[None, :]
            new_oh = jax.nn.one_hot(nr_c, H)[:, None] * jax.nn.one_hot(nc_c, Wd)[None, :]
            acc_ok = jnp.sum(sel[:, None, None] * access * new_oh[None]) > 0.5
            occupied = jnp.sum(occ * new_oh) > 0.5
            can = in_bounds & acc_ok & ~occupied
            moved = (a > 0) & can
            fr = jnp.where(moved, nr_c, r)
            fc = jnp.where(moved, nc_c, c)
            fin_oh = jnp.where(moved, new_oh, old_oh)
            # Vacate old tile if moved, claim the final one.
            occ = (occ & ~((old_oh > 0.5) & moved)) | (fin_oh > 0.5)
            loc = jnp.where(selb[:, None], jnp.stack([fr, fc])[None, :], loc)
            # Collect resources at the final tile (move.py:136-151).
            health = jnp.sum(res * fin_oh[None], axis=(1, 2))  # [C]
            collect = health >= 1.0
            bonus = (
                sel @ bonus_draws
                < jnp.sum(sel * state.agent_fields["bonus_gather_prob"])
            ).astype(jnp.float32)
            n_gathered = (1.0 + bonus) * collect
            inv = inv + sel[:, None] * (n_gathered @ col_proj)[None, :]
            res = res - collect.astype(jnp.float32)[:, None, None] * fin_oh[None]
            labor = jnp.where(moved, self.move_labor, 0.0) + (
                self.collect_labor * collect.sum()
            )
            endo = endo.at[:, lab_i].add(sel * labor)
            gn = jnp.where(selb[:, None], n_gathered[None, :], gn)
            return (loc, res, occ, inv, endo, gn), None

        gn0 = jnp.zeros((n, len(colls)), jnp.float32)
        carry = (state.loc, res_stack, occ, state.inventory, state.endogenous, gn0)
        # Full unroll lets XLA fuse the whole agent chain into a few kernels
        # (measured: 5.3 -> 1.0 ms net at 4096 envs, 4 agents on v5e); for
        # many-agent builds keep the rolled scan to bound compile time.
        (loc, res, _occ, inv, endo, gn), _ = jax.lax.scan(
            body, carry, order, unroll=(n <= 16)
        )

        maps = dict(state.maps)
        for j, rname in enumerate(colls):
            maps[rname] = res[j]
        comp = {**state.comp, self.name: {"ev_gathered": gn}}
        return state.replace(
            loc=loc, maps=maps, inventory=inv, endogenous=endo, comp=comp
        )

    # ------------------------------------------------------------------
    def dense_log_record(self, state: EnvState):
        cs = state.comp[self.name]
        return {"gathered": cs["ev_gathered"], "loc": state.loc}

    def decode_dense_log(self, stacked):
        """[T] list of gather-event lists (reference move.py:136-153)."""
        import numpy as np

        gn = np.asarray(stacked["gathered"])  # [T, N, C]
        loc = np.asarray(stacked["loc"])  # [T, N, 2]
        colls = self.spec.collectibles
        out = []
        for t in range(gn.shape[0]):
            evs = []
            for i, ci in zip(*np.nonzero(gn[t])):
                evs.append({
                    "agent": int(i), "resource": colls[ci],
                    "n": int(gn[t, i, ci]), "loc": loc[t, i].tolist(),
                })
            out.append(evs)
        return out

    def obs(self, state: EnvState):
        return {"a": {"bonus_gather_prob": state.agent_fields["bonus_gather_prob"]}}

    def masks(self, state: EnvState):
        """Mask moves into occupied/inaccessible/out-of-bounds tiles
        (move.py:167-188). Order: [Left, Right, Up, Down].

        One-hot einsum selection instead of a batched advanced-indexing
        gather (measured ~2.5 ms/step net at 4096 envs): bf16 one-hots ride
        the MXU and the 0/1 products are exact."""
        spec = self.spec
        unocc = ~W.occupancy_map(spec, state.loc)
        acc = W.accessibility(spec, state)
        valid = jnp.pad(
            (unocc[None] & acc), ((0, 0), (1, 1), (1, 1)), constant_values=False
        ).astype(jnp.bfloat16)  # [N, H+2, W+2]
        roff = jnp.array([0, 0, -1, 1], jnp.int32)
        coff = jnp.array([-1, 1, 0, 0], jnp.int32)
        sel_r = jax.nn.one_hot(
            state.loc[:, 0:1] + roff[None] + 1, spec.height + 2, dtype=jnp.bfloat16
        )  # [N, 4, H+2]
        sel_c = jax.nn.one_hot(
            state.loc[:, 1:2] + coff[None] + 1, spec.width + 2, dtype=jnp.bfloat16
        )  # [N, 4, W+2]
        rows = jnp.einsum(
            "ndh,nhw->ndw", sel_r, valid, preferred_element_type=jnp.float32
        )
        mask = jnp.einsum(
            "ndw,ndw->nd", rows.astype(jnp.bfloat16), sel_c,
            preferred_element_type=jnp.float32,
        )
        return {"a": {self.name: mask}}
