"""Episode logging: dense-log collection and compressed JSON save/load.

TPU-native take on the reference's dense/replay logging
(ai_economist/foundation/base/base_env.py:763-814, foundation/utils.py:18-43):
under jit, per-step states are stacked into fixed-shape device arrays by
`DenseLogger` (a lax.scan-friendly collector); on host they decode into the
reference's dense-log dict layout. Logs are saved as lz4-compressed JSON when
python-lz4 is available, falling back to gzip (".json.gz") otherwise.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # the reference uses lz4 frames (foundation/utils.py:18-43)
    import lz4.frame as _lz4

    HAVE_LZ4 = True
except ModuleNotFoundError:
    # Native C++ LZ4-frame codec (ai_economist_tpu/native/lz4frame.cpp):
    # same .lz4 frame format, no python-lz4 needed.
    from ai_economist_tpu import native as _native

    if _native.available():

        class _NativeLz4:
            compress = staticmethod(_native.lz4_compress)
            decompress = staticmethod(_native.lz4_decompress)

        _lz4 = _NativeLz4
        HAVE_LZ4 = True
    else:
        _lz4 = None
        HAVE_LZ4 = False


def save_episode_log(log: Dict[str, Any], filepath: str) -> str:
    """Save a dense log as compressed JSON. Returns the path written."""
    payload = json.dumps(_to_jsonable(log)).encode()
    if HAVE_LZ4 and filepath.endswith(".lz4"):
        with open(filepath, "wb") as f:
            f.write(_lz4.compress(payload))
        return filepath
    if not filepath.endswith(".gz"):
        filepath = filepath + (".lz4" if HAVE_LZ4 else ".gz")
    if HAVE_LZ4 and filepath.endswith(".lz4"):
        with open(filepath, "wb") as f:
            f.write(_lz4.compress(payload))
    else:
        with gzip.open(filepath, "wb") as f:
            f.write(payload)
    return filepath


def load_episode_log(filepath: str) -> Dict[str, Any]:
    with open(filepath, "rb") as f:
        raw = f.read()
    if filepath.endswith(".lz4"):
        assert HAVE_LZ4, "lz4 not available to read .lz4 logs"
        raw = _lz4.decompress(raw)
    elif filepath.endswith(".gz"):
        raw = gzip.decompress(raw)
    return json.loads(raw.decode())


def _to_jsonable(x):
    if isinstance(x, dict):
        return {str(k): _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, (np.ndarray, jnp.ndarray)):
        return np.asarray(x).tolist()
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    return x


class DenseLogger:
    """Collect per-step env state snapshots on device; decode on host.

    Usage:
        logger = DenseLogger(env, world_log_every=50)
        rec = logger.record(state, actions, rew)   # inside the step loop
        ... stack recs (e.g. via lax.scan ys) ...
        dense_log = logger.decode(stacked_recs)
    """

    def __init__(self, env, world_log_every: int = 50):
        self.env = env
        self.world_log_every = int(world_log_every)

    def record(self, state, actions, rew) -> Dict[str, jnp.ndarray]:
        """One step's fixed-shape log record (jit-safe)."""
        rec = {
            "t": state.t,
            "loc": state.loc,
            "inventory": state.inventory,
            "escrow": state.escrow,
            "endogenous": state.endogenous,
            "rew_a": rew["a"],
            "rew_p": rew["p"],
        }
        if actions.get("a") is not None:
            rec["act_a"] = jnp.asarray(actions["a"])
        if actions.get("p") is not None:
            rec["act_p"] = jnp.asarray(actions["p"])
        # Periodic world snapshots (base_env.py:984-998)
        log_world = (state.t % self.world_log_every) == 0
        from ai_economist_tpu.core import world as W

        rec["world"] = jnp.where(
            log_world, W.map_state(self.env.world, state), jnp.nan
        )
        # Component event streams (trades/builds/gathers/taxes —
        # base_env.py:802-812 back-fills get_dense_log per component).
        events = {}
        for comp in self.env.components:
            r = comp.dense_log_record(state)
            if r:
                events[comp.name] = r
        if events:
            rec["events"] = events
        return rec

    def decode(self, stacked: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Stacked [T, ...] device records -> reference-style dense log."""
        stacked = jax.tree.map(np.asarray, stacked)
        T = stacked["t"].shape[0]
        spec = self.env.world
        out: Dict[str, Any] = {
            "world": [], "states": [], "actions": [], "rewards": [],
        }
        for t in range(T):
            states_t = {}
            for i in range(spec.n_agents):
                states_t[str(i)] = {
                    "loc": stacked["loc"][t, i].tolist(),
                    "inventory": {
                        r: float(stacked["inventory"][t, i, spec.res_idx(r)])
                        for r in spec.resources
                    },
                    "escrow": {
                        r: float(stacked["escrow"][t, i, spec.res_idx(r)])
                        for r in spec.resources
                    },
                    "endogenous": {
                        e: float(stacked["endogenous"][t, i, spec.endo_idx(e)])
                        for e in spec.endogenous
                    },
                }
            out["states"].append(states_t)
            out["rewards"].append(
                {
                    **{str(i): float(stacked["rew_a"][t, i])
                       for i in range(spec.n_agents)},
                    "p": float(stacked["rew_p"][t]),
                }
            )
            if "act_a" in stacked:
                out["actions"].append(
                    {str(i): int(stacked["act_a"][t, i])
                     for i in range(spec.n_agents)}
                )
            world_t = stacked["world"][t]
            if np.isfinite(world_t).all():
                out["world"].append(
                    {k: world_t[ci].tolist()
                     for ci, k in enumerate(spec.map_keys)}
                )
            else:
                # Reference keeps one (falsy) entry per un-logged timestep so
                # indices line up (vis_world_range filters on truthiness).
                out["world"].append({})
        # Component event streams at their shorthand keys
        # (base_env.py:802-812: "Trade", "Build", "Gather", "PeriodicTax").
        events = stacked.get("events", {})
        for comp in self.env.components:
            if comp.name not in events:
                continue
            decoded = comp.decode_dense_log(events[comp.name])
            if decoded is not None:
                out[comp.short] = decoded
        return out
