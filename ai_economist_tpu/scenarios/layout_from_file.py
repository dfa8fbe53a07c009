"""LayoutFromFile / SplitLayout: fixed ASCII-map wood-and-stone scenarios.

TPU-native rewrite of ai_economist/foundation/scenarios/simple_wood_and_stone/
layout_from_file.py:64-801. The layout format is identical to the
reference's (`W`/`S`/`@` = wood/stone/water source tiles, rows separated by
";"), so existing reference map files load directly; this repo ships its own
generated layouts under scenarios/map_txt/ (see map_txt/generate_maps.py).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core import world as W
from ai_economist_tpu.core.scenario import scenario_registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.scenarios.wood_and_stone import Uniform

MAP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "map_txt")


def parse_layout(layout_string: str, world_size) -> Dict[str, np.ndarray]:
    """ASCII layout -> {Wood, Stone, Water} source maps
    (layout_from_file.py:103-112)."""
    lookup = {"W": "Wood", "S": "Stone", "@": "Water"}
    maps = {v: np.zeros(world_size) for v in lookup.values()}
    for r, row in enumerate(layout_string.split(";")):
        for c, symbol in enumerate(row):
            name = lookup.get(symbol)
            if name and r < world_size[0] and c < world_size[1]:
                maps[name][r, c] = 1
    return maps


def _rank_averaged_build_skills(n_agents, pmsm, payment, seed=1, batch=100000):
    """Rank-averaged clipped Pareto build payments
    (layout_from_file.py:178-190)."""
    rng = np.random.default_rng(seed)
    samples = rng.pareto(4, size=(batch, n_agents))
    clipped = np.minimum(pmsm, (pmsm - 1) * samples + 1)
    return np.sort(clipped, axis=1).mean(axis=0) * payment


@scenario_registry.add
class LayoutFromFile(Uniform):
    name = "layout_from_file/simple_wood_and_stone"
    agent_subclasses = ["BasicMobileAgent", "BasicPlanner"]
    required_entities = ["Wood", "Stone", "Water"]

    def __init__(
        self,
        spec,
        components,
        env,
        env_layout_file="quadrant_25x25_20each_30clump.txt",
        resource_regen_prob=0.01,
        fixed_four_skill_and_loc=False,
        **kwargs,
    ):
        super().__init__(spec, components, env, **kwargs)
        path = (
            env_layout_file
            if os.path.isabs(env_layout_file)
            else os.path.join(MAP_DIR, env_layout_file)
        )
        with open(path) as f:
            # Only trim trailing newlines: leading spaces are empty tiles of
            # the first row (a bare .strip() would shift the whole row).
            self.env_layout_string = f.read().rstrip("\n")
        src = parse_layout(self.env_layout_string, (spec.height, spec.width))
        self._layout_maps = {k: jnp.asarray(v, jnp.float32) for k, v in src.items()}

        for res in ("Wood", "Stone"):
            self.layout_specs[res] = dict(
                regen_weight=float(resource_regen_prob),
                regen_halfwidth=0,
                max_health=1,
            )

        self.fixed_four_skill_and_loc = bool(fixed_four_skill_and_loc)
        if self.fixed_four_skill_and_loc:
            bm = next(c for c in components if c.name == "Build")
            assert bm.skill_dist == "pareto"
            self._avg_ranked_skill = jnp.asarray(
                _rank_averaged_build_skills(
                    self.n_agents, bm.payment_max_skill_multiplier, bm.payment, seed=1
                ),
                jnp.float32,
            )
            # Corner start positions per skill group
            # (layout_from_file.py:193-237): worst top-right, then bottom-left,
            # top-left, best bottom-right.
            H, Wd = spec.height, spec.width
            corners = [(0, Wd - 1), (H - 1, 0), (0, 0), (H - 1, Wd - 1)]
            signs = [(1, -1), (-1, 1), (1, 1), (-1, -1)]
            groups = np.floor(np.arange(self.n_agents) * (4 / self.n_agents)).astype(int)
            n_in_group = np.zeros(4, int)
            locs = []
            for g in groups:
                gp = n_in_group[g]
                r0, c0 = corners[g]
                sr, sc = signs[g]
                locs.append((r0 + sr * (gp // 4), c0 + sc * (gp % 4)))
                n_in_group[g] += 1
            self._ranked_locs = jnp.asarray(locs, jnp.int32)

    def reset_layout(self, state: EnvState, key) -> EnvState:
        """Set the fixed layout (layout_from_file.py:323-333)."""
        maps = self.spec.init_maps()
        for name, m in self._layout_maps.items():
            if name in ("Wood", "Stone"):
                maps[name] = m
                maps[f"{name}SourceBlock"] = m
            else:
                maps[name] = m
        return state.replace(maps=maps)

    def additional_reset(self, state: EnvState, key) -> EnvState:
        if self.fixed_four_skill_and_loc:
            # Permute agents over the four fixed skill/loc slots
            # (layout_from_file.py:565-570).
            perm = jax.random.permutation(key, self.n_agents)
            loc = -jnp.ones((self.n_agents, 2), jnp.int32)
            loc = loc.at[perm].set(self._ranked_locs)
            fields = dict(state.agent_fields)
            pay = jnp.zeros((self.n_agents,), jnp.float32)
            pay = pay.at[perm].set(self._avg_ranked_skill)
            fields["build_payment"] = pay
            state = state.replace(loc=loc, agent_fields=fields)
        return super().additional_reset(state, key)


@scenario_registry.add
class SplitLayout(LayoutFromFile):
    """Water row splits the map; agents placed top/bottom by skill rank
    (layout_from_file.py:653-801)."""

    name = "split_layout/simple_wood_and_stone"

    def __init__(
        self,
        spec,
        components,
        env,
        water_row=None,
        skill_rank_of_top_agents=None,
        skill_seed=17,
        **kwargs,
    ):
        super().__init__(spec, components, env, **kwargs)
        assert not self.fixed_four_skill_and_loc
        self._water_line = (
            spec.height // 2 if water_row is None else int(water_row)
        )
        maps = {}
        for name, m in self._layout_maps.items():
            m = np.array(m)
            m[self._water_line, :] = 1 if name == "Water" else 0
            maps[name] = jnp.asarray(m, jnp.float32)
        self._layout_maps = maps

        if skill_rank_of_top_agents is None:
            skill_rank_of_top_agents = [0]
        if isinstance(skill_rank_of_top_agents, (int, float)):
            skill_rank_of_top_agents = [int(skill_rank_of_top_agents)]
        self.skill_rank_of_top_agents = sorted(set(skill_rank_of_top_agents))
        assert 0 < len(self.skill_rank_of_top_agents) < self.n_agents

        bm = next(c for c in components if c.name == "Build")
        assert bm.skill_dist == "pareto"
        skills = _rank_averaged_build_skills(
            self.n_agents, bm.payment_max_skill_multiplier, bm.payment, seed=skill_seed
        )
        self._avg_ranked_skill = jnp.asarray(skills[::-1].copy(), jnp.float32)

    def additional_reset(self, state: EnvState, key) -> EnvState:
        spec = self.spec
        n = self.n_agents
        k_perm, k_place, k_super = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n)
        state = state.replace(loc=-jnp.ones((n, 2), jnp.int32))
        access = W.accessibility(spec, state)
        top = jnp.zeros((n,), bool)
        for rank in self.skill_rank_of_top_agents:
            top = top.at[rank].set(True)
        rows = jnp.arange(spec.height)
        top_region = (rows < self._water_line)[:, None]
        place_keys = jax.random.split(k_place, n)

        fields = dict(state.agent_fields)
        pay = jnp.zeros((n,), jnp.float32).at[perm].set(self._avg_ranked_skill)
        fields["build_payment"] = pay

        def body(carry, i):
            # i = rank index; agent = perm[i]
            loc, occ = carry
            agent = perm[i]
            region = jnp.where(top[i], top_region, ~top_region)
            valid = access[agent] & ~occ & region
            logits = jnp.where(valid.reshape(-1), 0.0, -jnp.inf)
            flat = jax.random.categorical(place_keys[i], logits)
            r, c = flat // spec.width, flat % spec.width
            loc = loc.at[agent, 0].set(r.astype(jnp.int32)).at[agent, 1].set(
                c.astype(jnp.int32)
            )
            occ = occ.at[r, c].set(True)
            return (loc, occ), None

        occ0 = jnp.zeros((spec.height, spec.width), bool)
        (loc, _), _ = jax.lax.scan(
            body, (state.loc, occ0), jnp.arange(n)
        )
        state = state.replace(loc=loc, agent_fields=fields)
        return Uniform.additional_reset(self, state, k_super)
