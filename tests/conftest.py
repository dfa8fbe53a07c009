"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation instead.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the real TPU
# tunnel), but semantics tests belong on the virtual 8-device CPU mesh — the
# single chip is reserved for bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache inside the repo: /tmp does not survive between
# CI sessions, and the suite's wall time is dominated by XLA compiles of the
# while_loop-heavy resets and the Saez tax graphs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
