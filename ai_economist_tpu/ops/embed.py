"""Tiny-table embedding as a Pallas VMEM contraction (no HBM one-hot).

The ConvLSTM policies embed the map's index channels through a tiny
learned table ([vocab≈100, features≈4], the reference's input_emb_vocab /
idx_emb_dim — tutorials/rllib/tf_models.py:52-57,117-124). Neither classic
lowering survives chip-scale batches on TPU:

* `nn.Embed` (gather + scatter-add backward): the 10M-index scatter into a
  [100, 4] table serializes — profiled at ~75% of a whole 2048-env PPO
  train iteration in round 4.
* one-hot einsum (`onehot(idx) @ table`, the round-4 fix): XLA materializes
  the one-hot in HBM. A round-5 device trace of one train iteration
  (PROFILE_train_r05.json) showed ~700 ms of its 1046 ms were broadcasts of
  u8[40960,11,11,2,100] one-hots (2.56x tile-padding inflation -> ~2.5 GB),
  plus the T(4,128)->T(8,128) retiling reshapes feeding the kron dot.

This kernel keeps the one-hot in VMEM registers only: per (channel,
M-block) grid cell it builds oh[v, m] = (idx[c, m] == v) with a sublane
iota compare and contracts it against the VMEM-resident table on the MXU.
HBM traffic is the true minimum — read idx (int32 [C, M]), write the
[C*F, M] feature-major output (8 exact sublanes, M exact lanes: zero tile
padding). The backward pass is the transposed contraction, accumulated in
VMEM across the sequential grid — the table gradient never touches a
scatter and the one-hot never exists in HBM there either.

Forward values are bit-exact vs the gather/einsum (exactly one nonzero per
one-hot row, f32 MXU accumulation of a single term). The table gradient
matches the einsum up to summation order.

Off TPU (and for small batches, where pallas launch overhead dominates)
the op falls back to the einsum path; `_FORCE_INTERPRET` runs the kernel
in interpreter mode so tests cover the lowering on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Test hook: take the pallas path (interpreter mode) even off-TPU.
_FORCE_INTERPRET = False

# Below this many index lookups the einsum path wins (measured on v5e at
# the phase-1 shapes: the per-STEP rollout forward, ~2.0M lookups/call,
# ran 2.3x slower through the kernel's transpose+launch overhead, while
# the update's ~10M-lookup folded chunks ran 3x faster); above it the
# kernel's HBM savings dominate.
_MIN_KERNEL_ELEMENTS = 1 << 22

_LANE = 128
_BLOCK_M = 2048


def _embed_fwd_kernel(tab_ref, idx_ref, o_ref, *, C, V, F):
    """One M-block: all C channels' embeddings, feature-major.

    tab_ref [Vp, F] f32, idx_ref [C, BM] i32, o_ref [C*F, BM] in the
    output dtype (bf16 when feeding a conv — XLA converts conv operands
    to bf16 anyway, so emitting it directly halves every downstream
    relayout of this tensor).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (tab_ref.shape[0],
                                                idx_ref.shape[1]), 0)
    idx = idx_ref[...]
    tab = tab_ref[...]
    parts = []
    for c in range(C):
        oh = (iota == idx[c][None, :]).astype(tab.dtype)
        parts.append(jax.lax.dot_general(
            tab, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    out = parts[0] if C == 1 else jnp.concatenate(parts, axis=0)
    # Whole-block write (sublane-offset ref stores are not Mosaic-portable).
    o_ref[...] = out.astype(o_ref.dtype)


def _embed_bwd_kernel(idx_ref, g_ref, dtab_ref, *, C, V, F):
    """Accumulate dtable += onehot @ g^T across the sequential grid.

    idx_ref [C, BM] i32, g_ref [C*F, BM] f32, dtab_ref [Vp, F] f32.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (dtab_ref.shape[0],
                                                idx_ref.shape[1]), 0)
    idx = idx_ref[...]
    g = g_ref[...]
    acc = dtab_ref[...]
    for c in range(C):
        oh = (iota == idx[c][None, :]).astype(g.dtype)
        acc = acc + jax.lax.dot_general(
            oh, g[c * F:(c + 1) * F, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dtab_ref[...] = acc


def _pad_table(table, Vp):
    V, F = table.shape
    return jnp.pad(table, ((0, Vp - V), (0, 0)))


def _fwd_call(table, idxT, *, C, V, F, out_dtype, interpret):
    Vp = -(-V // 8) * 8  # sublane-align the contraction dim
    M = idxT.shape[1]
    kernel = functools.partial(_embed_fwd_kernel, C=C, V=V, F=F)
    return pl.pallas_call(
        kernel,
        grid=(M // _BLOCK_M,),
        in_specs=[
            pl.BlockSpec((Vp, F), lambda i: (0, 0)),
            pl.BlockSpec((C, _BLOCK_M), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((C * F, _BLOCK_M), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C * F, M), out_dtype),
        interpret=interpret,
    )(_pad_table(table, Vp), idxT)


def _bwd_call(idxT, g, *, C, V, F, interpret):
    Vp = -(-V // 8) * 8
    M = idxT.shape[1]
    kernel = functools.partial(_embed_bwd_kernel, C=C, V=V, F=F)
    dtab = pl.pallas_call(
        kernel,
        grid=(M // _BLOCK_M,),
        in_specs=[
            pl.BlockSpec((C, _BLOCK_M), lambda i: (0, i)),
            pl.BlockSpec((C * F, _BLOCK_M), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((Vp, F), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Vp, F), jnp.float32),
        interpret=interpret,
    )(idxT, g)
    return dtab[:V]


def make_embed_op(vocab: int, features: int, channels: int,
                  out_dtype=jnp.float32):
    """Build f(table [V, F] f32, idxT [C, M] i32) -> [C*F, M] out_dtype
    with a custom VJP (gradient w.r.t. table only; indices are integers).

    M must be a multiple of the kernel block (the caller pads; padded
    index columns use value >= V, whose one-hot row is all-zero, so they
    produce zero output and zero gradient).
    """
    V, F, C = vocab, features, channels

    @jax.custom_vjp
    def embed(table, idxT):
        return _fwd_call(table, idxT, C=C, V=V, F=F, out_dtype=out_dtype,
                         interpret=_FORCE_INTERPRET)

    def fwd(table, idxT):
        return embed(table, idxT), idxT

    def bwd(idxT, g):
        dtab = _bwd_call(idxT, g, C=C, V=V, F=F,
                         interpret=_FORCE_INTERPRET)
        return dtab, None

    embed.defvjp(fwd, bwd)
    return embed


def embed_lookup(table: jnp.ndarray, idx: jnp.ndarray,
                 out_dtype=None) -> jnp.ndarray:
    """Differentiable (in `table`) embedding of integer-valued `idx`.

    table [V, F]; idx [..., C] in any integer-valued dtype (u8/i32/f32
    holding small ints). Returns [..., C*F]: per-channel embeddings
    concatenated along features (the kron-merged layout OneHotEmbed emits),
    in `out_dtype` (default: the table's dtype; pass bf16 when the consumer
    is a conv — XLA converts conv operands to bf16 regardless, and emitting
    it directly halves every relayout of this training-batch-sized tensor).

    On TPU with enough lookups this is the Pallas VMEM kernel; otherwise a
    one-hot contraction with identical values (built directly in the
    [..., C*V] kron shape — no [..., C, V] intermediate, no retiling
    reshape between the compare and the dot).
    """
    V, F = table.shape
    C = idx.shape[-1]
    lead = idx.shape[:-1]
    out_dtype = table.dtype if out_dtype is None else out_dtype
    M0 = 1
    for d in lead:
        M0 *= int(d)

    use_kernel = (jax.default_backend() == "tpu" and
                  M0 * C >= _MIN_KERNEL_ELEMENTS) or _FORCE_INTERPRET
    if not use_kernel:
        # Compare in idx's native dtype (avoids an s32 cast of f32-stored
        # maps). pos // V selects the channel via a C-1-deep select chain
        # (C is 1 or 2 here), so the one-hot is born in its dot shape.
        pos = jnp.arange(C * V)
        cls = (pos % V).astype(idx.dtype)
        sel = idx[..., 0:1]
        for c in range(1, C):
            sel = jnp.where(pos < c * V, sel, idx[..., c:c + 1])
        oh = (sel == cls).astype(table.dtype)
        t2 = jnp.kron(jnp.eye(C, dtype=table.dtype), table)
        out = jax.lax.dot_general(
            oh.reshape(-1, C * V), t2, (((1,), (0,)), ((), ())))
        return out.reshape(lead + (C * F,)).astype(out_dtype)

    idx2 = idx.reshape(M0, C).astype(jnp.int32)
    M = -(-M0 // _BLOCK_M) * _BLOCK_M
    if M != M0:
        # Pad with V: one-hot row all-zero -> zero output + zero grad.
        idx2 = jnp.pad(idx2, ((0, M - M0), (0, 0)), constant_values=V)
    idxT = jnp.transpose(idx2, (1, 0))
    out = make_embed_op(V, F, C, out_dtype)(table, idxT)  # [C*F, M]
    out = jnp.transpose(out, (1, 0))[:M0]
    return out.reshape(lead + (C * F,))
