"""Agent-type registry: BasicMobileAgent and BasicPlanner descriptors.

The reference exports an `agents` registry of per-agent classes
(ai_economist/foundation/agents/__init__.py, mobiles.py:11-18,
planners.py:11-40) whose instances hold per-agent dict state. In this
TPU-native engine agent state is structure-of-arrays inside `EnvState`
(core/state.py), so agent *types* are static descriptors carrying the
metadata the reference's classes did (name, embodiment, multi-action default,
uniqueness). The registry exists for public-API parity with
`foundation.agents.<lookup>` — `TpuEnv` itself takes the equivalent knobs
directly (multi_action_mode_* constructor args, core/env.py:48-63) rather
than reading these descriptors.
"""

from __future__ import annotations

from ai_economist_tpu.core.registry import Registry


class BaseAgentType:
    """Static descriptor for one agent class.

    Attributes mirror the reference BaseAgent contract
    (foundation/base/base_agent.py:16-80):
      name: registry key.
      has_location: whether agents of this type occupy a grid cell (mobiles
        do; the planner has no `loc`, planners.py:18-27).
      multi_action_mode_default: default action encoding (mobiles: single
        integer; planner: one sub-action per subspace).
      unique: at most one instance per env (the planner, planners.py:14).
    """

    name = ""
    has_location = True
    multi_action_mode_default = False
    unique = False


agent_registry = Registry(BaseAgentType)


@agent_registry.add
class BasicMobileAgent(BaseAgentType):
    """Embodied, movable agent (reference mobiles.py:11-18)."""

    name = "BasicMobileAgent"
    has_location = True
    multi_action_mode_default = False
    unique = False


@agent_registry.add
class BasicPlanner(BaseAgentType):
    """Social planner: disembodied, unique, idx "p" (planners.py:11-40)."""

    name = "BasicPlanner"
    has_location = False
    multi_action_mode_default = True
    unique = True
