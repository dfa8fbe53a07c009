"""The envs-on-lanes egocentric-windows op must agree exactly with the
per-env dynamic-slice semantics (reference window extraction:
dynamic_layout.py:473-578) in both its unbatched and batched lowering,
including the Pallas kernel (run in interpreter mode on CPU) with and
without 4-channel byte packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_economist_tpu.ops.windows import (
    _ladder_plan,
    _lanes_windows,
    make_windows_op,
)


def brute_force(maps, loc, K):
    out = np.stack([
        maps[:, r:r + K, c:c + K] for r, c in np.asarray(loc)
    ])
    return out.astype(np.float32)


def test_ladder_plan_covers_every_shift():
    for max_shift in (0, 1, 5, 24, 31, 60):
        for K in (1, 7, 11):
            steps, extent = _ladder_plan(max_shift, K)
            for r in range(max_shift + 1):
                pos, rem = 0, r
                cur = max(extent, K)
                for s, keep in steps:
                    assert s + keep <= cur, (max_shift, K, r)
                    if rem >= s:
                        pos, rem = pos + s, rem - s
                    cur = keep
                assert rem == 0 and pos == r, (max_shift, K, r)
                assert cur >= K


def test_windows_unbatched_and_batched_match_brute_force():
    H = Wd = 13
    w = 3
    K = 2 * w + 1
    N, M, E = 4, 6, 9
    op = make_windows_op(N, w, H, Wd, byte_ok=True)

    rng = np.random.RandomState(0)
    maps = rng.randint(0, 7, size=(E, M, H + 2 * w, Wd + 2 * w)).astype(np.float32)
    loc = rng.randint(0, [H, Wd], size=(E, N, 2)).astype(np.int32)

    # Unbatched
    single = jax.jit(op)(jnp.asarray(maps[0]), jnp.asarray(loc[0]))
    np.testing.assert_array_equal(np.asarray(single), brute_force(maps[0], loc[0], K))

    # Batched (the CPU fallback path here)
    batched = jax.jit(jax.vmap(op))(jnp.asarray(maps), jnp.asarray(loc))
    assert batched.shape == (E, N, M, K, K)
    for e in range(E):
        np.testing.assert_array_equal(
            np.asarray(batched[e]), brute_force(maps[e], loc[e], K),
            err_msg=f"env {e}",
        )


@pytest.mark.parametrize("pack", [True, False])
@pytest.mark.parametrize("world", [(25, 25, 5, 4, 14), (13, 9, 2, 3, 5)])
def test_lanes_kernel_interpret_matches_brute_force(pack, world):
    """The Pallas kernel itself (interpreter mode), packed and unpacked,
    against brute force — including corner locations (0 and H-1) that
    exercise the full ladder range."""
    H, Wd, w, N, M = world
    K = 2 * w + 1
    E = 256
    rng = np.random.RandomState(3)
    maps = rng.randint(0, 127, size=(E, M, H + 2 * w, Wd + 2 * w)).astype(np.float32)
    loc = rng.randint(0, [H, Wd], size=(E, N, 2)).astype(np.int32)
    loc[0] = [0, 0]
    loc[1] = [H - 1, Wd - 1]
    out = jax.jit(lambda m, l: _lanes_windows(
        m, l, n_agents=N, K=K, max_r=H - 1, max_c=Wd - 1,
        block_e=128, pack=pack, interpret=True,
    ))(jnp.asarray(maps), jnp.asarray(loc))
    assert out.shape == (E, N, M, K, K)
    for e in range(0, E, 37):
        np.testing.assert_array_equal(
            np.asarray(out[e]), brute_force(maps[e], loc[e], K),
            err_msg=f"env {e}",
        )
    np.testing.assert_array_equal(np.asarray(out[0]), brute_force(maps[0], loc[0], K))
    np.testing.assert_array_equal(np.asarray(out[1]), brute_force(maps[1], loc[1], K))


@pytest.mark.parametrize("E", [120, 9, 200])
def test_lanes_path_serves_non_divisible_env_counts(E, monkeypatch):
    """Round-4 review item: E=120 (the committed phase-1/2 and saez training
    configs) silently fell back to the per-env slice path. The batched
    lowering must now pad the env axis to the 128-lane block, run the Pallas
    kernel, and slice back — bit-identical to the slice path at ANY E."""
    import ai_economist_tpu.ops.windows as W

    H = Wd = 25
    w = 5
    K = 2 * w + 1
    N, M = 4, 7
    rng = np.random.RandomState(E)
    maps = rng.randint(0, 127, size=(E, M, H + 2 * w, Wd + 2 * w)).astype(np.float32)
    loc = rng.randint(0, [H, Wd], size=(E, N, 2)).astype(np.int32)
    loc[0] = [0, 0]
    loc[-1] = [H - 1, Wd - 1]

    op = make_windows_op(N, w, H, Wd, byte_ok=True)
    ref = jax.jit(jax.vmap(op))(jnp.asarray(maps), jnp.asarray(loc))

    calls = []
    orig = W._lanes_windows

    def spy(*args, **kwargs):
        calls.append(args[0].shape)
        return orig(*args, **kwargs)

    monkeypatch.setattr(W, "_lanes_windows", spy)
    monkeypatch.setattr(W, "_FORCE_LANES_INTERPRET", True)
    op2 = make_windows_op(N, w, H, Wd, byte_ok=True)
    out = jax.jit(jax.vmap(op2))(jnp.asarray(maps), jnp.asarray(loc))

    # The kernel ran, on an env axis padded to the 128 block.
    assert calls and calls[0][0] == -(-E // 128) * 128
    assert out.shape == (E, N, M, K, K)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_windows_inside_scan_vmap_jit():
    """The op must compose with scan+vmap+jit the way the trainer uses it."""
    H = Wd = 9
    w = 2
    N, M, E, T = 3, 4, 6, 5
    op = make_windows_op(N, w, H, Wd, byte_ok=False)
    rng = np.random.RandomState(2)
    maps = jnp.asarray(rng.rand(E, M, H + 2 * w, Wd + 2 * w).astype(np.float32))
    locs = jnp.asarray(rng.randint(0, [H, Wd], size=(T, E, N, 2)).astype(np.int32))

    def step(carry, loc_t):
        out = jax.vmap(op)(maps, loc_t)
        return carry + out.sum(), out

    tot, outs = jax.jit(lambda: jax.lax.scan(step, 0.0, locs))()
    assert outs.shape == (T, E, N, M, 2 * w + 1, 2 * w + 1)
    ref = sum(
        brute_force(np.asarray(maps[e]), np.asarray(locs[t, e]), 2 * w + 1).sum()
        for t in range(T) for e in range(E)
    )
    np.testing.assert_allclose(float(tot), ref, rtol=1e-5)
