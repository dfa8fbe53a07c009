"""Device-mesh helpers: env-axis data parallelism over TPU chips.

The reference's replica parallelism — Ray rollout workers
(tutorials/rllib/phase1/config.yaml) and WarpDrive's one-CUDA-block-per-env
(ai_economist/foundation/env_wrapper.py:199-265) — becomes a leading `env`
axis sharded with `jax.sharding.NamedSharding` over a Mesh. Cross-replica
state sync (e.g. the Saez tax buffer all-gather, reference
tutorials/rllib/utils/remote.py:56-73) rides XLA collectives over ICI instead
of Ray RPC.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_name: str = "env",
    devices: Optional[Sequence] = None,
    model_axis: int = 1,
) -> Mesh:
    """1-D (or 2-D env x model) mesh over all available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis > 1:
        assert n % model_axis == 0
        arr = np.array(devices).reshape(n // model_axis, model_axis)
        return Mesh(arr, (axis_name, "model"))
    return Mesh(np.array(devices), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Shard the leading (env) axis of every leaf across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = "env"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sh = env_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
