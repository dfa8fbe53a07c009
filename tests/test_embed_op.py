"""The Pallas VMEM embedding must agree with the one-hot einsum it
replaces (forward bit-exact, table gradient to summation-order tolerance)
across idx dtypes, channel counts, and the non-block-multiple padding
path. The kernel lowering runs in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_economist_tpu.ops import embed as embed_mod
from ai_economist_tpu.ops.embed import embed_lookup, make_embed_op


def einsum_reference(table, idx):
    V, F = table.shape
    C = idx.shape[-1]
    oh = (idx[..., None] == jnp.arange(V).astype(idx.dtype)).astype(
        table.dtype)
    t2 = jnp.kron(jnp.eye(C, dtype=table.dtype), table)
    out = jax.lax.dot_general(oh.reshape(-1, C * V), t2,
                              (((1,), (0,)), ((), ())))
    return out.reshape(idx.shape[:-1] + (C * F,))


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(embed_mod, "_FORCE_INTERPRET", True)
    # Small block so the grid has several steps at test sizes (covers the
    # sequential-accumulation init in the backward kernel).
    monkeypatch.setattr(embed_mod, "_BLOCK_M", 256)


@pytest.mark.parametrize("dtype", [jnp.uint8, jnp.int32, jnp.float32])
@pytest.mark.parametrize("C", [1, 2])
def test_forward_bit_exact(force_interpret, dtype, C):
    V, F = 100, 4
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (7, 11, 11, C), 0, V)
    idx = idx.astype(dtype)
    out = embed_lookup(table, idx)
    ref = einsum_reference(table, idx)
    assert out.shape == ref.shape == (7, 11, 11, C * F)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # And bit-exact vs the plain gather.
    gathered = table[idx.astype(jnp.int32)].reshape(7, 11, 11, C * F)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gathered))


def test_padding_path_non_multiple_of_block(force_interpret):
    """M0 deliberately not a multiple of the kernel block."""
    V, F = 17, 3
    table = jax.random.normal(jax.random.PRNGKey(2), (V, F))
    idx = jax.random.randint(jax.random.PRNGKey(3), (301, 2), 0, V)
    out = embed_lookup(table, idx)
    ref = einsum_reference(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_table_gradient_matches_einsum(force_interpret):
    V, F, C = 100, 4, 2
    table = jax.random.normal(jax.random.PRNGKey(4), (V, F))
    idx = jax.random.randint(jax.random.PRNGKey(5), (520, C), 0, V)
    g_out = jax.random.normal(jax.random.PRNGKey(6), (520, C * F))

    def loss_kernel(t):
        return (embed_lookup(t, idx) * g_out).sum()

    def loss_ref(t):
        return (einsum_reference(t, idx) * g_out).sum()

    gk = jax.grad(loss_kernel)(table)
    gr = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)
    # Padded index columns (value V) must contribute nothing: every class
    # row's gradient is the sum of its g rows, nothing more.
    assert np.isfinite(np.asarray(gk)).all()


def test_jit_and_inside_scan(force_interpret):
    """The op must trace under jit and lax.scan (the epoch loop wraps it)."""
    V, F = 100, 4
    table = jax.random.normal(jax.random.PRNGKey(7), (V, F))
    idx = jax.random.randint(jax.random.PRNGKey(8), (3, 260, 2), 0, V)

    @jax.jit
    def epochs(t):
        def body(carry, x):
            out = embed_lookup(t, x)
            return carry + out.sum(), None
        s, _ = jax.lax.scan(body, 0.0, idx)
        return s

    got = epochs(table)
    want = sum(float(einsum_reference(table, idx[i]).sum()) for i in range(3))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_small_batches_use_einsum_fallback():
    """Below the size threshold the lookup is the einsum (no pallas call),
    still bit-exact vs the gather."""
    V, F = 10, 4
    table = jax.random.normal(jax.random.PRNGKey(9), (V, F))
    idx = jax.random.randint(jax.random.PRNGKey(10), (5, 2), 0, V)
    out = embed_lookup(table, idx)
    gathered = table[idx].reshape(5, 2 * F)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gathered))


def test_make_embed_op_direct(force_interpret):
    """Direct op-level contract: [C, M] i32 -> [C*F, M], padded idx == V
    yields zero columns."""
    V, F, C = 12, 4, 2
    M = 512
    table = jax.random.normal(jax.random.PRNGKey(11), (V, F))
    idxT = jax.random.randint(jax.random.PRNGKey(12), (C, M), 0, V)
    idxT = idxT.at[:, -3:].set(V)  # padded columns
    out = make_embed_op(V, F, C)(table, idxT)
    assert out.shape == (C * F, M)
    np.testing.assert_array_equal(np.asarray(out[:, -3:]), 0.0)
    tab_np = np.concatenate([np.asarray(table), np.zeros((1, F))], axis=0)
    want = np.concatenate(
        [tab_np[np.asarray(idxT[c])].T for c in range(C)], axis=0)
    np.testing.assert_array_equal(np.asarray(out), want)
