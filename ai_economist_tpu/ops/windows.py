"""Egocentric map windows with an envs-on-lanes batched layout.

The spatial scenarios observe, per agent, a (2w+1) x (2w+1) window of the
world map centered at the agent's location (reference hot path:
foundation/scenarios/simple_wood_and_stone/dynamic_layout.py:473-578, which
slices numpy per agent). Naively batching the op over thousands of envs
with `vmap` gives XLA one tiny [N*K, Hp] x [Hp, M*Wp] one-hot matmul pair
per env: measured on v5e at 4096 envs that pair is OCCUPANCY-bound — every
[.., K, K]-shaped intermediate pays padded (8,128)-tile traffic, and it
costs ~6.4 ms/step, half the whole env step (PROFILE_r03.json).

This module fixes the layout instead of the op: under `vmap` a Pallas
kernel runs with the env axis as the MINOR (lane) dimension —
`[channels, Hp, Wp, E]` — so every vector op is full-lane. Per agent the
window extraction is a per-lane-variable shift, done as a greedy
NARROWING-CONTAINER select ladder (pure elementwise VPU work in VMEM — no
MXU, no gathers, no HBM round-trips between steps): processing shift bits
high-to-low, each step keeps only the rows any remaining shift could still
need, so the container shrinks  42 -> 26 -> 18 -> 14 -> 12 -> 11:

    take = rem >= s;  y = where(take, y[s:s+keep], y[:keep]);  rem -= s*take

The ladder composes to y = x[shift : shift+K] exactly (test-verified
against dynamic_slice), and every step is two static slices + one
full-lane select, which Mosaic keeps in VMEM. The same ladder runs once
more along columns on the already-row-sliced block.

Two further levers beyond the layout:

* BYTE PACKING (the default when the caller asserts its map values are
  integers in [0, 127] — see the construction-time guard in
  scenarios/wood_and_stone.py, and ADVICE r3 on silent int8 wrapping):
  4 channels pack into one int32 lane, so the select ladder runs on 1/4
  the data. Packing fuses into the input transpose; unpacking fuses into
  the output transpose.
* Each map block is read from HBM once and serves all agents.

The XLA-level version of the same algorithm does NOT work: XLA will not
fuse the roll/select chain, so every step materializes the full
[channels, Hp, Wp, E] array (measured 9-50 ms at bench shapes).

Under `jit` with a sharded env axis (parallel/distributed.py GSPMD path)
the op partitions over E via `custom_partitioning` — every dim is a
passthrough factor, so shardy splits the kernel per shard with no
collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (
    custom_partitioning,
    SdyShardingRule,
)


# Test hook: when True the batched path takes the lanes kernel (in Pallas
# interpreter mode) even off-TPU, so the padded-E lowering is testable on CPU.
_FORCE_LANES_INTERPRET = False


def _ladder_plan(max_shift: int, K: int):
    """Greedy power-of-2 narrowing plan for shifts in [0, max_shift].

    Returns (steps, extent): steps = [(s, keep), ...] processed in order,
    where after consuming step size `s` any remaining shift is < s so only
    the first `s - 1 + K` rows can still matter; `extent` is the input
    container size the first step reads (>= s0 + keep0).
    """
    steps = []
    rem = max_shift
    for j in reversed(range(max(1, max_shift.bit_length()))):
        s = 1 << j
        if s > rem:
            continue
        keep = min(rem, s - 1) + K
        steps.append((s, keep))
        rem = min(rem, s - 1)
    extent = K if not steps else max(s + keep for s, keep in steps)
    return steps, extent


def _select_ladder(y, shift, steps, axis):
    """Apply a narrowing ladder along `axis` (0 or 1) of y[..., E]."""
    rem = shift
    for s, keep in steps:
        take = rem >= s  # [E]
        if axis == 0:
            y = jnp.where(take[None, None, :], y[s:s + keep], y[:keep])
        else:
            y = jnp.where(take[None, None, :], y[:, s:s + keep], y[:, :keep])
        rem = rem - s * take.astype(rem.dtype)
    return y


def _windows_kernel(loc_ref, x_ref, o_ref, *, n_agents, K, steps_r, steps_c):
    """One (channel-slot, env-block) cell: all agents' windows for the slot.

    loc_ref: [2, N, BE] i32 (rows; cols), x_ref: [1, Rext, Cext, BE],
    o_ref: [N, 1, K, K, BE].
    """
    x = x_ref[0]
    for n in range(n_agents):
        y = _select_ladder(x, loc_ref[0, n], steps_r, axis=0)[:K]
        y = _select_ladder(y, loc_ref[1, n], steps_c, axis=1)[:, :K]
        o_ref[n, 0] = y


def _lanes_windows(maps, loc, *, n_agents, K, max_r, max_c, block_e, pack,
                   interpret=False):
    """Envs-on-lanes Pallas path. maps [E,M,Hp,Wp], loc [E,N,2] -> [E,N,M,K,K]."""
    E, M, Hp, Wp = maps.shape
    steps_r, ext_r = _ladder_plan(max_r, K)
    steps_c, ext_c = _ladder_plan(max_c, K)
    ext_r, ext_c = max(ext_r, Hp), max(ext_c, Wp)

    x = jnp.transpose(maps, (1, 2, 3, 0))  # [M, Hp, Wp, E]
    if pack:
        # 4 byte-valued channels per int32 lane; the pack fuses into the
        # transpose above, the unpack into the output transpose below.
        S = -(-M // 4)
        xi = x.astype(jnp.int32)
        xi = jnp.pad(xi, ((0, 4 * S - M), (0, 0), (0, 0), (0, 0)))
        xi = xi.reshape(S, 4, Hp, Wp, E)
        x = (xi[:, 0] | (xi[:, 1] << 8) | (xi[:, 2] << 16) | (xi[:, 3] << 24))
    else:
        S = M
    x = jnp.pad(x, ((0, 0), (0, ext_r - Hp), (0, ext_c - Wp), (0, 0)))
    locT = jnp.transpose(loc, (2, 1, 0))  # [2, N, E]

    kernel = functools.partial(
        _windows_kernel, n_agents=n_agents, K=K,
        steps_r=steps_r, steps_c=steps_c,
    )
    out = pl.pallas_call(
        kernel,
        grid=(S, E // block_e),
        in_specs=[
            pl.BlockSpec((2, n_agents, block_e), lambda m, e: (0, 0, e)),
            pl.BlockSpec((1, ext_r, ext_c, block_e), lambda m, e: (m, 0, 0, e)),
        ],
        out_specs=pl.BlockSpec(
            (n_agents, 1, K, K, block_e), lambda m, e: (0, m, 0, 0, e)
        ),
        out_shape=jax.ShapeDtypeStruct((n_agents, S, K, K, E), x.dtype),
        interpret=interpret,
    )(locT, x)

    if pack:
        parts = [(out >> (8 * i)) & 0xFF for i in range(4)]
        out = jnp.stack(parts, axis=2).reshape(n_agents, 4 * S, K, K, E)[:, :M]
    return jnp.transpose(out, (4, 0, 1, 2, 3)).astype(jnp.float32)


def make_windows_op(n_agents: int, window: int, height: int, width: int,
                    byte_ok: bool = False):
    """Build the egocentric-windows op for a fixed world geometry.

    Returns f(padded_maps [M, Hp, Wp] f32, loc [N, 2] i32) -> [N, M, K, K]
    f32 with K = 2*window+1, Hp = height + 2*window: the window of channel
    stack `padded_maps` at rows loc[n,0]..loc[n,0]+K-1 (padded coordinates,
    i.e. centered at the agent for a world-coords location). Under
    `jax.vmap` over a leading env axis on TPU the op always lowers to the
    envs-on-lanes Pallas kernel — env counts that are not a multiple of the
    128-lane block are padded up and the output sliced back, so training
    configs like E=120 use the kernel too; off TPU it lowers to the plain
    per-env slice path.

    byte_ok: caller asserts every map value is an integer in [0, 127]
    (e.g. max_health <= 127 and n_agents + 2 <= 127); enables 4-channel
    int32 byte packing in the kernel. With byte_ok=False the kernel runs
    unpacked f32 — correct for any values, ~4x more VPU work.
    """
    K = 2 * window + 1

    def single(maps, loc):
        m = maps.shape[0]

        def one(n):
            return jax.lax.dynamic_slice(
                maps, (0, loc[n, 0], loc[n, 1]), (m, K, K)
            )

        return jnp.stack([one(n) for n in range(n_agents)])

    def batched_impl(maps, loc):
        E = maps.shape[0]
        use_lanes = jax.default_backend() == "tpu" or _FORCE_LANES_INTERPRET
        if not use_lanes:
            return jax.vmap(single)(maps, loc)
        # block_e=128 keeps the working set (double-buffered in/out blocks +
        # the compiler's stack for the agent-loop ladder temporaries) under
        # the 16 MB scoped-VMEM budget; 256 was measured to OOM at 16.5 MB
        # on the bench shapes. Non-divisible env counts (e.g. the 120-replica
        # phase-1/2 training configs) are PADDED up to the next block — the
        # padded lanes cost pure VPU work and are sliced off the output —
        # so the kernel, not the per-env slice fallback, serves every TPU
        # batch size (round-4 review: the fallback silently bypassed the
        # kernel on exactly the committed training configs).
        block_e = 128
        Ep = -(-E // block_e) * block_e
        if Ep != E:
            maps = jnp.pad(maps, ((0, Ep - E), (0, 0), (0, 0), (0, 0)))
            loc = jnp.pad(loc, ((0, Ep - E), (0, 0), (0, 0)))
        out = _lanes_windows(
            maps, loc, n_agents=n_agents, K=K,
            max_r=height - 1, max_c=width - 1,
            block_e=block_e, pack=byte_ok,
            interpret=_FORCE_LANES_INTERPRET,
        )
        return out[:E] if Ep != E else out

    batched = custom_partitioning(batched_impl)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = jax.tree.map(lambda s: s.sharding, tuple(arg_shapes))
        return mesh, batched_impl, result_shape.sharding, arg_shardings

    # Every dim is a passthrough factor: shardy may split any of them, and
    # the per-shard lowering is just the same kernel on the local block
    # (in practice only `e`, the env axis, is ever sharded).
    batched.def_partition(
        partition,
        sharding_rule=SdyShardingRule(
            (("e", "m", "h", "w"), ("e", "n", "two")),
            (("e", "n", "m", "k", "l"),),
        ),
    )

    @custom_batching.custom_vmap
    def egocentric_windows(maps, loc):
        return single(maps, loc)

    @egocentric_windows.def_vmap
    def _batched_rule(axis_size, in_batched, maps, loc):
        maps_b, loc_b = in_batched
        if not maps_b:
            maps = jnp.broadcast_to(maps, (axis_size,) + maps.shape)
        if not loc_b:
            loc = jnp.broadcast_to(loc, (axis_size,) + loc.shape)
        return batched(maps, loc), True

    return egocentric_windows
