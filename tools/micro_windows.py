"""Microbench: egocentric-window extraction variants at bench shapes.

Times, on the real chip, the old one-hot-einsum window path (per-env tiny
matmuls under vmap, PROFILE_r03's top phase) against the envs-on-lanes
per-lane-roll op (ops/windows.py), at the exact shapes of bench.py's
gather-trade-build config (4096 envs, 4 agents, 25x25 world, w=5).

Each variant runs inside ONE jit as a lax.scan over R iterations with
rotating `loc` inputs (axon tunnel quirk: repeated identical dispatches can
report bogus ~0.04 ms timings; and per-call dispatch latency ~1.4-2.4 ms
would swamp ms-scale ops), so the report is net ms/iteration.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ai_economist_tpu.ops.windows import make_windows_op

E, N, H, Wd, w = 4096, 4, 25, 25, 5
K = 2 * w + 1
Hp, Wp = H + 2 * w, Wd + 2 * w
M = 14  # map channels (8) + ones + idx channels (5) on the bench config
R = 50


def old_einsum_windows(maps, loc):
    """The round-3 shipped path (wood_and_stone.py:395-448), per env."""
    win = jnp.arange(K)
    sel_r = jax.nn.one_hot(loc[:, 0:1] + win[None, :], Hp, dtype=jnp.int8)
    sel_c = jax.nn.one_hot(loc[:, 1:2] + win[None, :], Wp, dtype=jnp.int8)
    rows = jnp.einsum("nkh,chw->nckw", sel_r, maps.astype(jnp.int8),
                      preferred_element_type=jnp.int32)
    return jnp.einsum("nckw,nlw->nckl", rows.astype(jnp.int8), sel_c,
                      preferred_element_type=jnp.int32).astype(jnp.float32)


def bench(name, fn, maps, locs_warm, locs_timed):
    stepper = jax.jit(
        lambda maps, locs: jax.lax.scan(
            lambda c, l: (c + fn(maps, l).sum(), None), 0.0, locs)[0]
    )
    # Warm with a DIFFERENT input than the timed call: the axon tunnel
    # serves repeated identical (executable, args) dispatches from a cache,
    # reporting bogus ~microsecond timings.
    stepper(maps, locs_warm).block_until_ready()
    t0 = time.perf_counter()
    tot = stepper(maps, locs_timed)
    tot.block_until_ready()
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name:34s} {dt:7.3f} ms/iter  (sum={float(tot):.0f})")
    return dt


def main():
    rng = np.random.RandomState(0)
    maps = jnp.asarray(rng.randint(0, 2, size=(E, M, Hp, Wp)).astype(np.float32))
    locs_w = jnp.asarray(rng.randint(0, [H, Wd], size=(R, E, N, 2)).astype(np.int32))
    locs_t = jnp.asarray(rng.randint(0, [H, Wd], size=(R, E, N, 2)).astype(np.int32))

    results = {}
    results["old_einsum_int8"] = bench(
        "old: one-hot einsum pair (int8)", jax.vmap(old_einsum_windows),
        maps, locs_w, locs_t)
    op = make_windows_op(N, w, H, Wd)
    results["lanes_pallas"] = bench(
        "new: envs-on-lanes pallas roll", jax.vmap(op), maps, locs_w, locs_t)
    best = min(results, key=results.get)
    print(f"best: {best}  speedup vs old: "
          f"{results['old_einsum_int8'] / results[best]:.2f}x")


if __name__ == "__main__":
    main()
