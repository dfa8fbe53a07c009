"""ai_economist_tpu: a TPU-native multi-agent economic simulation framework.

A from-scratch JAX/XLA reimplementation of the capabilities of
salesforce/ai-economist ("Foundation"): scenarios composed of pluggable
economic components over a 2-D grid world with mobile agents and a social
planner, plus fully on-device batched simulation and RL training.

Everything is built TPU-first: state is a pytree of structure-of-arrays,
scenario/component dynamics are pure jittable transition functions, envs
batch with `jax.vmap` and shard over a `jax.sharding.Mesh`.

Public API (mirrors reference foundation/__init__.py:7-18):
    make_env_instance(scenario_name, **env_config) -> TpuEnv
    scenarios / components / agents / resources / landmarks / endogenous registries
"""

from ai_economist_tpu.core.agents import agent_registry as agents
from ai_economist_tpu.core.entities import (
    endogenous_registry as endogenous,
    landmark_registry as landmarks,
    resource_registry as resources,
)
from ai_economist_tpu.core.env import TpuEnv, make_env_instance
from ai_economist_tpu.core.state import EnvState

# Importing these subpackages registers the built-in components/scenarios.
import ai_economist_tpu.components  # noqa: F401,E402
import ai_economist_tpu.scenarios  # noqa: F401,E402

# Registry aliases bound AFTER the subpackage imports above, so the
# registries (not the same-named subpackage modules) win the name.
from ai_economist_tpu.core.component import component_registry as components  # noqa: E402
from ai_economist_tpu.core.scenario import scenario_registry as scenarios  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "make_env_instance",
    "TpuEnv",
    "EnvState",
    "scenarios",
    "components",
    "agents",
    "resources",
    "landmarks",
    "endogenous",
]
