"""Scenario base: world/agent reset, passive dynamics, observations, rewards.

TPU-first analog of the reference's BaseEnvironment scenario hooks
(ai_economist/foundation/base/base_env.py:1037-1120): every hook is a pure
function of EnvState, so the whole episode pipeline jits and vmaps.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from ai_economist_tpu.core.registry import Registry
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.core.world import WorldSpec


class Scenario:
    name: str = ""
    agent_subclasses: Sequence[str] = ("BasicMobileAgent", "BasicPlanner")
    required_entities: Sequence[str] = ()

    def __init__(self, spec: WorldSpec, components, env):
        self.spec = spec
        self.components = components
        self.env = env
        self.n_agents = spec.n_agents
        self.episode_length = env.episode_length
        self.inv_scale = env.inv_scale
        self.world_size = [spec.height, spec.width]

    # --- state lifecycle --------------------------------------------------
    def init_scen_state(self):
        """Initial scenario-private state pytree (persists across episodes
        unless reset_* explicitly clears parts of it)."""
        return None

    def reset_layout(self, state: EnvState, key) -> EnvState:
        """Reset resource/landmark layout (reset_starting_layout analog)."""
        raise NotImplementedError

    def reset_agent_states(self, state: EnvState, key) -> EnvState:
        """Reset inventories/locations (reset_agent_states analog)."""
        raise NotImplementedError

    def additional_reset(self, state: EnvState, key) -> EnvState:
        """Final reset customization (additional_reset_steps analog)."""
        return state

    # --- dynamics ---------------------------------------------------------
    def step(self, state: EnvState, key, draws=None) -> EnvState:
        """Passive world dynamics, run after all component steps.

        `draws` optionally injects explicit random values for the
        reference-parity harness (see TpuEnv.step)."""
        return state

    # --- observation / reward --------------------------------------------
    def obs(self, state: EnvState) -> Dict[str, Dict[str, jnp.ndarray]]:
        """{"a": {...[N,...]}, "p": {...}, "pa": {...[N,...]}}."""
        raise NotImplementedError

    def reward(self, state: EnvState):
        """Return (state, {"a": [N] f32, "p": scalar f32})."""
        raise NotImplementedError

    # --- reporting --------------------------------------------------------
    def metrics(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        return {}


scenario_registry = Registry(Scenario)
