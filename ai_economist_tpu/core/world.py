"""WorldSpec (static spatial metadata) and pure map operations.

Replaces the reference's stateful Maps/World objects (ai_economist/foundation/
base/world.py:13-483) with:
  * `WorldSpec` — static, hashable build-time metadata (entity channel order,
    landmark classification, sizes), and
  * pure functions computing occupancy/accessibility and performing map edits
    as functional array updates on `EnvState.maps`.

Channel ordering parity: the reference builds `_map_keys` by iterating sorted
resources (collectibles only) then landmarks (sorted scenario/component
landmarks followed by auto-appended `<R>SourceBlock`s in sorted-resource
order) — reference world.py:59-93 with the sorted() applied at
base_env.py:396-408. WorldSpec reproduces that exact order so stacked map
observations match channel-for-channel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ai_economist_tpu.core.entities import landmark_registry, resource_registry
from ai_economist_tpu.core.state import EnvState


@dataclass(frozen=True)
class WorldSpec:
    """Static spatial/entity layout for one environment build."""

    height: int
    width: int
    n_agents: int
    resources: Tuple[str, ...]  # sorted; includes non-collectibles (Coin)
    landmarks: Tuple[str, ...]  # sorted scenario landmarks + SourceBlocks
    endogenous: Tuple[str, ...]  # sorted

    # Derived channel bookkeeping (filled by `build`)
    map_keys: Tuple[str, ...] = ()
    collectibles: Tuple[str, ...] = ()
    blocking: Tuple[str, ...] = ()
    private: Tuple[str, ...] = ()
    public: Tuple[str, ...] = ()

    @staticmethod
    def build(world_size, n_agents, resources, landmarks, endogenous) -> "WorldSpec":
        resources = tuple(sorted(set(resources)))
        endogenous = tuple(sorted(set(endogenous)))
        base_landmarks = sorted(set(landmarks))

        map_keys, collectibles = [], []
        full_landmarks = list(base_landmarks)
        for r in resources:
            if resource_registry.get(r).collectible:
                map_keys.append(r)
                collectibles.append(r)
                full_landmarks.append(f"{r}SourceBlock")

        blocking, private, public = [], [], []
        for lm_name in full_landmarks:
            lm = landmark_registry.get(lm_name)
            map_keys.append(lm_name)
            if lm.public:
                public.append(lm_name)
            elif lm.blocking:
                blocking.append(lm_name)
            elif lm.private:
                private.append(lm_name)
            else:
                raise NotImplementedError(lm_name)

        return WorldSpec(
            height=int(world_size[0]),
            width=int(world_size[1]),
            n_agents=int(n_agents),
            resources=resources,
            landmarks=tuple(full_landmarks),
            endogenous=endogenous,
            map_keys=tuple(map_keys),
            collectibles=tuple(collectibles),
            blocking=tuple(blocking),
            private=tuple(private),
            public=tuple(public),
        )

    # --- index helpers (static; usable inside jit) ---
    def res_idx(self, name: str) -> int:
        return self.resources.index(name)

    def endo_idx(self, name: str) -> int:
        return self.endogenous.index(name)

    @property
    def size(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @property
    def n_resources(self) -> int:
        return len(self.resources)

    def init_maps(self) -> Dict[str, jnp.ndarray]:
        """Zero-initialised map channels (+ owner channels for private LMs)."""
        hw = (self.height, self.width)
        maps = {k: jnp.zeros(hw, jnp.float32) for k in self.map_keys}
        for p in self.private:
            maps[f"{p}__owner"] = -jnp.ones(hw, jnp.int32)
        return maps


# ---------------------------------------------------------------------------
# Pure spatial queries (replacing Maps.accessibility / unoccupied / state)
# ---------------------------------------------------------------------------


def loc_one_hot(spec: WorldSpec, loc: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] float32 one-hot of each agent's tile; all-zero off-board.

    Scatter-free building block: TPU scatters/gathers cost ~0.5-2 ms per op
    at large env batch (see ai_economist_tpu/ops), so per-agent position
    masks are built as one-hot outer products instead.
    """
    on_board = (loc[:, 0] >= 0).astype(jnp.float32)[:, None, None]
    r = jnp.clip(loc[:, 0], 0, spec.height - 1)
    c = jnp.clip(loc[:, 1], 0, spec.width - 1)
    oh = (
        jax.nn.one_hot(r, spec.height)[:, :, None]
        * jax.nn.one_hot(c, spec.width)[:, None, :]
    )
    return oh * on_board


def occupancy_map(spec: WorldSpec, loc: jnp.ndarray) -> jnp.ndarray:
    """[H, W] bool: True where a mobile agent stands. loc [-1,-1] = off-board."""
    return loc_one_hot(spec, loc).sum(axis=0) > 0.5


def accessibility(spec: WorldSpec, state: EnvState) -> jnp.ndarray:
    """[N, H, W] bool: which tiles each agent may legally occupy.

    Blocking landmarks exclude everyone; private landmarks exclude everyone but
    their owner (reference world.py:213-217, 224-227, 301-305).
    """
    net = jnp.ones((spec.n_agents, spec.height, spec.width), jnp.bool_)
    for b in spec.blocking:
        net = net & (state.maps[b] == 0)[None]
    agent_ids = jnp.arange(spec.n_agents, dtype=jnp.int32)[:, None, None]
    for p in spec.private:
        owner = state.maps[f"{p}__owner"][None]
        net = net & ((owner == agent_ids) | (owner == -1))
    return net


def loc_map(spec: WorldSpec, loc: jnp.ndarray) -> jnp.ndarray:
    """[H, W] int32 map of agent indices; -1 where no agent (world.py:407-416).

    Agents occupy distinct tiles, so a sum of (idx+1)-weighted one-hots
    minus 1 reproduces the scatter exactly."""
    oh = loc_one_hot(spec, loc)
    ids1 = jnp.arange(1, spec.n_agents + 1, dtype=jnp.float32)[:, None, None]
    return (oh * ids1).sum(axis=0).astype(jnp.int32) - 1


def map_state(spec: WorldSpec, state: EnvState) -> jnp.ndarray:
    """[C, H, W] float32 stack of all health channels in map-key order."""
    return jnp.stack([state.maps[k] for k in spec.map_keys]).astype(jnp.float32)


def owner_state(spec: WorldSpec, state: EnvState) -> jnp.ndarray:
    """[P, H, W] int32 stack of private-landmark owner channels."""
    if not spec.private:
        return jnp.zeros((0, spec.height, spec.width), jnp.int32)
    return jnp.stack([state.maps[f"{p}__owner"] for p in spec.private])


def empty_map(spec: WorldSpec, state: EnvState) -> jnp.ndarray:
    """[H, W] bool: tiles with no landmark or resource (world.py:307-312)."""
    return map_state(spec, state).sum(axis=0) == 0


def create_landmark(
    spec: WorldSpec,
    maps: Dict[str, jnp.ndarray],
    name: str,
    r: jnp.ndarray,
    c: jnp.ndarray,
    owner=None,
) -> Dict[str, jnp.ndarray]:
    """Place one unit of a landmark at (r, c), functionally (world.py:474-479)."""
    maps = dict(maps)
    maps[name] = maps[name].at[r, c].set(1.0)
    if name in spec.private:
        assert owner is not None
        maps[f"{name}__owner"] = maps[f"{name}__owner"].at[r, c].set(
            jnp.asarray(owner, jnp.int32)
        )
    return maps


def consume_resource(
    maps: Dict[str, jnp.ndarray], name: str, r: jnp.ndarray, c: jnp.ndarray, n=1.0
) -> Dict[str, jnp.ndarray]:
    """Remove up to n units of a resource at (r, c) (world.py:481-483)."""
    maps = dict(maps)
    maps[name] = maps[name].at[r, c].set(jnp.maximum(0.0, maps[name][r, c] - n))
    return maps
