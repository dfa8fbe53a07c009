"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation instead.

IMPORTANT: `import pytest` already imports jax (the `axon` PJRT package
registers a pytest entry point), so env vars set here are too late for
jax's import-time config reads. We therefore configure through
`jax.config.update`, which works any time before the backends initialize —
and backends initialize lazily on first device use, which is after conftest.
"""

import os
import sys

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the real TPU
# tunnel), but semantics tests belong on the virtual 8-device CPU mesh — the
# single chip is reserved for bench.py. Running tests through the tunnel is
# also 10-100x slower per compile.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache inside the repo: /tmp does not survive between
# CI sessions, and the suite's wall time is dominated by XLA compiles of the
# while_loop-heavy resets and the Saez tax graphs.
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# 8 virtual CPU devices for sharding/mesh tests. XLA reads XLA_FLAGS at
# backend initialization, which has not happened yet.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, _REPO)
