"""Observation packaging: fixed-shape dicts -> flat policy vectors.

Reproduces the reference packager semantics (ai_economist/foundation/base/
base_env.py:562-612): per agent entry, every scalar / 1-D field is
concatenated into a single "flat" float32 vector in SORTED KEY ORDER; fields
named "action_mask" and multi-dimensional arrays (spatial maps) are kept as
separate tensors. "time" appears in both (put_in_both, base_env.py:684-686).

Here observations are collated: agent ("a") entries carry a leading [N] axis,
so a reference-scalar is a [N] array and a reference-vector is [N, k]. The
sorted-key concat therefore happens on the last axis, yielding identical flat
layouts per agent as the reference produces per agent object.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

KEEP_AS_IS_NDIM = 2  # reference: arrays with ndim > 1 are kept unflattened


def package_obs(
    obs: Dict[str, jnp.ndarray], batch_ndim: int, put_in_both=("time",)
) -> Dict[str, jnp.ndarray]:
    """Package one entry's obs dict into {"flat": ..., <kept tensors>...}.

    batch_ndim: number of leading batch axes (1 for collated agents, 0 for the
    planner). A field with (ndim - batch_ndim) > 1 is kept as-is.
    """
    kept = {}
    flat_parts = []
    for k in sorted(obs.keys()):
        v = obs[k]
        v = jnp.asarray(v)
        payload_ndim = v.ndim - batch_ndim
        if k == "action_mask" or payload_ndim > 1:
            kept[k] = v
            continue
        if payload_ndim == 0:
            v = v[..., None]
        flat_parts.append(v.astype(jnp.float32))
        if k in put_in_both:
            kept[k] = obs[k]
    if flat_parts:
        kept["flat"] = jnp.concatenate(flat_parts, axis=-1)
    return kept


def flat_keys(obs: Dict[str, jnp.ndarray], batch_ndim: int):
    """The sorted keys participating in "flat" (for introspection/debugging)."""
    keys = []
    for k in sorted(obs.keys()):
        v = jnp.asarray(obs[k])
        if k == "action_mask" or (v.ndim - batch_ndim) > 1:
            continue
        keys.append(k)
    return keys
