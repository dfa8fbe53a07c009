"""Cross-replica Saez buffer synchronization.

Replaces the reference's Ray-RPC gather/broadcast of per-worker Saez buffers
(tutorials/rllib/utils/remote.py:56-73 + redistribution.py:514-550) with an
all-gather over the batched env axis: every replica's local income/rate ring
buffer is concatenated into a shared global buffer which is broadcast back
into each replica's `global_buf` slot. Call between episodes, exactly like
the reference syncs between training iterations
(tutorials/rllib/training_script.py:202-220).

Works on a plain batched state (leading env axis) regardless of device
sharding — under `jit` with sharded inputs, XLA lowers the reshuffle to ICI
collectives.

Scaling note: the global buffer has capacity R * buffer_size, so the day-1
Saez formula (histograms + OLS over the whole buffer) grows with the
replica count. Training envs are therefore built with
saez_rates_external=True (training/run.py): the formula is hoisted out of
the vmapped step to a batch-level scalar lax.cond that fires once per tax
period (core/env.py maybe_saez_refresh), exactly like the reference's
once-per-period rate set — replica count no longer multiplies per-step
cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ai_economist_tpu.core.state import EnvState


def sync_saez_buffers(states: EnvState, component_name: str = "PeriodicBracketTax") -> EnvState:
    """Gather all replicas' local buffers into each replica's global buffer.

    states: batched EnvState with leading env axis [R]. The tax component must
    have been built with `saez_global_replicas=R` so global_buf has capacity
    R * buffer_size.
    """
    cs = states.comp[component_name]
    if "global_buf" not in cs:
        # Component built without a global buffer (saez_global_replicas=0):
        # nothing to sync. The training runner auto-wires the capacity from
        # num_envs (run.py build_trainer), so this path only triggers for
        # hand-built envs — degrade to a no-op rather than crash.
        return states
    buf = cs["buf"]  # [R, S, 2]
    count = cs["buf_count"]  # [R]
    R, S, _ = buf.shape
    gcap = cs["global_buf"].shape[1]
    assert gcap == R * S, (
        f"global buffer capacity {gcap} != n_replicas*buffer_size {R * S}; "
        f"build PeriodicBracketTax with saez_global_replicas={R}"
    )

    # Compact each replica's valid entries to the front, then concatenate.
    slot = jnp.arange(S)
    valid = slot[None, :] < count[:, None]  # [R, S]
    # Sort per replica so valid entries lead (stable: preserves order).
    order = jnp.argsort(~valid, axis=1, stable=True)
    compacted = jnp.take_along_axis(buf, order[..., None], axis=1)

    flat = compacted.reshape(R * S, 2)
    flat_valid = jnp.take_along_axis(valid, order, axis=1).reshape(R * S)
    gorder = jnp.argsort(~flat_valid, stable=True)
    global_buf = flat[gorder]
    global_count = flat_valid.sum().astype(jnp.int32)

    new_cs = dict(cs)
    new_cs["global_buf"] = jnp.broadcast_to(global_buf[None], (R, R * S, 2))
    new_cs["global_count"] = jnp.broadcast_to(global_count[None], (R,))
    # Entries are now folded into the global buffer (reference resets the
    # per-episode addition counter on sync, training_script.py:202-220).
    new_cs["additions_this_episode"] = jnp.zeros_like(cs["additions_this_episode"])
    return states.replace(comp={**states.comp, component_name: new_cs})
