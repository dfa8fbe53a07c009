"""TPU-native kernel-level primitives.

XLA's TPU sort costs ~2 ms per call at 4096-env batch regardless of the
per-row problem size, so every hot-path ordering in this engine runs on
sort-free primitives built from O(n^2) comparison matrices and one-hot
contractions — for the tiny n this simulation family uses (n_agents 4-10,
order books of ~20 slots) those fuse into the surrounding elementwise work
for free. Measured on the bench config: argsort 1.9 ms/call vs < 0.05 ms for
the counting-rank equivalent.

The reference's CUDA kernels have no counterpart for these (its order books
are Python lists, continuous_double_auction.py:80-97); this is the "native
tier" SURVEY.md 2.4 maps onto kernel-level code.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rank_small",
    "permutation_matrix",
    "sort_small",
    "take_by_rank",
    "uniform_permutation",
]


def rank_small(keys: jnp.ndarray) -> jnp.ndarray:
    """Stable ascending ranks of a small 1-D key vector (counting rank).

    rank[i] = position of keys[i] in the stable ascending sort — identical
    to `argsort(argsort(keys))` under stable argsort, with ties broken by
    index, but lowered as an O(n^2) comparison matrix instead of an XLA sort.
    """
    n = keys.shape[-1]
    tri = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]  # j < i
    lt = (keys[..., None, :] < keys[..., :, None]).sum(-1)
    eq_before = ((keys[..., None, :] == keys[..., :, None]) & tri).sum(-1)
    return lt + eq_before


def permutation_matrix(ranks: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[n, n] one-hot matrix P with P[slot, rank] = 1.

    sorted = einsum("sp,s->p", P, x); inverse = einsum("sp,p->s", P, y).
    """
    return jax.nn.one_hot(ranks, ranks.shape[-1], dtype=dtype)


def take_by_rank(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a permutation matrix: slot-order values -> rank-order values.
    Returns float32; cast back at the call site for int/bool payloads."""
    return jnp.einsum("...sp,...s->...p", P, x.astype(jnp.float32))


def sort_small(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of the last axis without an XLA sort (small n only)."""
    P = permutation_matrix(rank_small(x))
    return take_by_rank(P, x).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _perm_table(n: int):
    # Cache host numpy, NOT a jnp array: a jnp constant first materialized
    # inside a jit trace would leak that trace's tracer into later traces.
    return np.array(list(itertools.permutations(range(n))), np.int32)


def uniform_permutation(key, n: int) -> jnp.ndarray:
    """Uniform random permutation of range(n) without a sort.

    jax.random.permutation lowers to an XLA sort of random keys (~2 ms/call
    at 4096-env batch). For n <= 6 one randint into the precomputed n! table
    is exact-uniform and free. For larger n, counting-rank 64-bit random
    keys (index tiebreak): still sort-free O(n^2), with residual non-
    uniformity only on 64-bit key collisions (< n^2 / 2^64 per draw).
    """
    if n <= 6:
        table = jnp.asarray(_perm_table(n))
        idx = jax.random.randint(key, (), 0, table.shape[0])
        return table[idx]
    bits = jax.random.bits(key, (2, n), jnp.uint32)
    hi, lo = bits[0], bits[1]
    hj, hi_ = hi[None, :], hi[:, None]
    lj, lo_ = lo[None, :], lo[:, None]
    lt = (hj < hi_) | ((hj == hi_) & (lj < lo_))  # [i, j]: key_j < key_i
    tri = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
    eq_before = (hj == hi_) & (lj == lo_) & tri
    rank = (lt | eq_before).sum(-1)
    # perm[rank[i]] = i, via the one-hot permutation matrix (no scatter).
    return (
        (permutation_matrix(rank) * jnp.arange(n, dtype=jnp.float32)[:, None])
        .sum(0)
        .astype(jnp.int32)
    )
