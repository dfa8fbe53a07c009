"""EnvState: the entire simulation state as a single JAX pytree.

TPU-first redesign of the reference's object state (World/Maps/Agent objects,
reference ai_economist/foundation/base/world.py:36-483, base_agent.py:62) into
structure-of-arrays form:

  * one [H, W] float32 channel per spatial entity (+ an int32 owner channel per
    private landmark),
  * agent quantities as [n_agents, k] arrays,
  * per-component private state grouped under `comp[name]`,
  * scenario private state under `scen`.

All functions that consume/produce EnvState are written for a SINGLE env and
batched with `jax.vmap` over thousands of replicas; the leading env axis is
then sharded over the device mesh (see ai_economist_tpu/parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Complete per-env simulation state (a pure pytree)."""

    # --- global ---
    t: jnp.ndarray  # int32 scalar: current timestep within the episode
    key: jnp.ndarray  # PRNG key consumed/split each step
    completions: jnp.ndarray  # int32 scalar: episodes completed by this replica

    # --- spatial (Maps analog; reference world.py:36-112) ---
    # maps[name] is [H, W] float32 health; private landmarks additionally have
    # maps[f"{name}__owner"] as [H, W] int32 (-1 = unowned).
    maps: Dict[str, jnp.ndarray]

    # --- mobile agents (SoA; reference base_agent.py:62) ---
    loc: jnp.ndarray  # [N, 2] int32 (row, col); [-1, -1] = off the board
    inventory: jnp.ndarray  # [N, R] float32 in sorted-resource order
    escrow: jnp.ndarray  # [N, R] float32
    endogenous: jnp.ndarray  # [N, E] float32 in sorted-endogenous order
    # Extra per-agent scalar fields components register
    # (reference base_component.py:198-224), e.g. "bonus_gather_prob".
    agent_fields: Dict[str, jnp.ndarray]  # each [N] float32

    # --- planner ---
    p_inventory: jnp.ndarray  # [R] float32
    p_escrow: jnp.ndarray  # [R] float32

    # --- component / scenario private state ---
    comp: Dict[str, Any]
    scen: Any

    def total_endowment(self, res_idx: int) -> jnp.ndarray:
        """[N] inventory + escrow for one resource column."""
        return self.inventory[:, res_idx] + self.escrow[:, res_idx]


def tree_replace(state: EnvState, **updates) -> EnvState:
    return state.replace(**updates)
