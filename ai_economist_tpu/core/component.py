"""Component base: economic dynamics as pure, jittable transition functions.

TPU-first redesign of the reference BaseComponent
(ai_economist/foundation/base/base_component.py:16-375): a component here is a
*static configuration object* whose methods are pure functions of EnvState.
Mutation of world/agent objects becomes functional array updates; the env core
composes `step` functions in config order, exactly reproducing the reference
pipeline ordering (base_env.py:1002-1005).

Observation convention (collated, TPU-native):
  obs()["a"]  -> {key: [N, ...]} stacked over mobile agents
  obs()["p"]  -> {key: scalar/array} planner obs
  obs()["pa"] -> {key: [N, ...]} agent-wise planner obs (the reference's
                 "p<idx>" entries, base_env.py:639-698)

Mask convention:
  masks()["a"] -> {subspace_name: [N, n]} ; masks()["p"] -> {name: [n]}
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp

from ai_economist_tpu.core.registry import Registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.core.world import WorldSpec


class Component:
    name: str = ""
    shorthand: Optional[str] = None
    required_entities: Sequence[str] = ()
    agent_subclasses: Sequence[str] = ()

    def __init__(self, spec: WorldSpec, episode_length: int, inventory_scale: float):
        self.spec = spec
        self.episode_length = int(episode_length)
        self.inv_scale = float(inventory_scale)
        self.n_agents = spec.n_agents

    # --- static metadata -------------------------------------------------
    def n_actions(self, agent_cls_name: str):
        """None/0, int, or [(sub_name, n), ...] — see base_component.py:158-196."""
        raise NotImplementedError

    def agent_fields(self, agent_cls_name: str) -> Dict[str, float]:
        """Extra per-agent scalar state fields and their defaults."""
        return {}

    # --- state lifecycle --------------------------------------------------
    def init_state(self):
        """Initial private component state pytree (or None)."""
        return None

    def reset(self, state: EnvState, key) -> EnvState:
        """Per-episode reset (additional_reset_steps analog). Default: re-init."""
        return state.replace(comp={**state.comp, self.name: self.init_state()})

    # --- dynamics ---------------------------------------------------------
    def step(
        self,
        state: EnvState,
        a_actions: Dict[str, jnp.ndarray],
        p_actions: Dict[str, jnp.ndarray],
        key,
    ) -> EnvState:
        """Apply one timestep of this component's dynamics."""
        raise NotImplementedError

    # --- observation / masking -------------------------------------------
    def obs(self, state: EnvState) -> Dict[str, Dict[str, jnp.ndarray]]:
        return {}

    def masks(self, state: EnvState) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Default: all actions available (base_component.py:262-334)."""
        out: Dict[str, Dict[str, jnp.ndarray]] = {}
        n_a = self.n_actions("BasicMobileAgent")
        if n_a:
            if isinstance(n_a, int):
                out["a"] = {self.name: jnp.ones((self.n_agents, n_a), jnp.float32)}
            else:
                out["a"] = {
                    f"{self.name}.{s}": jnp.ones((self.n_agents, n), jnp.float32)
                    for s, n in n_a
                }
        n_p = self.n_actions("BasicPlanner")
        if n_p:
            if isinstance(n_p, int):
                out["p"] = {self.name: jnp.ones((n_p,), jnp.float32)}
            else:
                out["p"] = {
                    f"{self.name}.{s}": jnp.ones((n,), jnp.float32) for s, n in n_p
                }
        return out

    # --- reporting --------------------------------------------------------
    def metrics(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        return {}

    def dense_log_record(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        """Fixed-shape per-step event arrays for the dense log (jit-safe).

        Components that emit event streams (trades/builds/gathers/taxes —
        reference get_dense_log: continuous_double_auction.py:670-679,
        build.py:256-266, move.py:212-222, redistribution.py:1188-1202)
        stash the current step's events in their comp state during `step`
        and surface them here; `DenseLogger` stacks the records over the
        episode and `decode_dense_log` converts them to the reference's
        ragged JSON layout on host."""
        return {}

    def decode_dense_log(self, stacked) -> "list | None":
        """Host-side: stacked [T, ...] records -> reference-format event list
        (one entry per timestep), or None if this component logs nothing."""
        return None

    @property
    def short(self) -> str:
        return self.shorthand or self.name


component_registry = Registry(Component)
