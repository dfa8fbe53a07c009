"""RBC env-step throughput -> BENCH_rbc_rNN points.

Times the batched RBC market-day step (scenarios/rbc/env.py, the TPU
rewrite of firm_rbc.cu CudaStep) as a lax.scan with the state threaded
through and a reward checksum consumed — the only structure whose timing
the axon tunnel cannot fake (identical-arg repeats and scalar-only
consumers have both been observed reporting bogus sub-ms results).

Methodology: uniform-random valid multi-categorical actions are pre-staged
ON DEVICE for T1 and T2 steps; the reported rate is the MARGINAL cost
(t(T2) - t(T1)) / (T2 - T1), which cancels dispatch latency and the
host->device action transfer (those are fixed per call, not per step; in
real training actions come from on-device policies).

Usage: python tools/bench_rbc.py [--batches 128 4096]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.scenarios.rbc.env import RBCConfig, RBCEnvironment


def mk_acts(env, seed, T, B):
    """Uniform-random valid actions, generated ON DEVICE (outside timing)."""
    cfg = env.cfg
    dims = env.action_dims
    cons_dims = jnp.asarray(dims["consumer"], jnp.uint32)

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        raw = jax.random.bits(k1, (T, B, cfg.n_consumers, cfg.n_firms + 2),
                              jnp.uint32)
        return {
            "consumer": (raw % cons_dims).astype(jnp.int32),
            "firm": (jax.random.bits(k2, (T, B, cfg.n_firms), jnp.uint32)
                     % jnp.uint32(dims["firm"][0])).astype(jnp.int32),
            "government": (jax.random.bits(k3, (T, B), jnp.uint32)
                           % jnp.uint32(dims["government"][0])).astype(jnp.int32),
        }

    return gen(jax.random.PRNGKey(seed))


def bench_point(env, B, T1=60, T2=240, reps=3):
    @jax.jit
    def run(states, acts):
        def body(states, a_t):
            nstates, obs, rew, done, _ = jax.vmap(env.step)(states, a_t)
            return nstates, rew["government"].sum()
        states, out = jax.lax.scan(body, states, acts)
        return states, out.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.jit(jax.vmap(env.reset))(keys)

    def timed(T, seed):
        acts = mk_acts(env, seed, T, B)
        jax.block_until_ready(acts)
        s, t_ = run(states0, acts)          # compile/warm for this T
        jax.block_until_ready((s, t_))
        best = float("inf")
        for r in range(3):
            acts2 = mk_acts(env, seed + 100 + r, T, B)
            jax.block_until_ready(acts2)
            t0 = time.perf_counter()
            s, tot = run(states0, acts2)
            jax.block_until_ready((s, tot))
            best = min(best, time.perf_counter() - t0)
        return best

    # min-of-3 per T; marginal rate over the T spread cancels fixed costs.
    dt1, dt2 = timed(T1, 1), timed(T2, 2)
    return B * (T2 - T1) / max(dt2 - dt1, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 4096])
    args = ap.parse_args()

    cfg = RBCConfig()
    env = RBCEnvironment(cfg)
    tag = f"{cfg.n_consumers}c+{cfg.n_firms}f+{cfg.n_governments}g"
    points = []
    for B in args.batches:
        # Small batches do almost no work per step: widen the T spread so
        # the marginal difference clears timing noise.
        T1, T2 = (240, 1200) if B <= 512 else (60, 240)
        v = bench_point(env, B, T1, T2)
        points.append({
            "metric": f"env-steps/s/chip rbc {tag} x {B}env",
            "value": round(v, 1),
            "unit": "env-steps/s/chip",
        })
        print(points[-1])
    print(json.dumps({
        "points": points,
        "note": "reference scale is batch 128 on one GPU "
                "(rbc/cuda_manager.py:1399-1400); the large point is the "
                "chip's actual RBC throughput. Marginal-rate methodology "
                "(see module docstring): per-step cost net of dispatch and "
                "host->device action staging, state threaded, checksum "
                "consumed.",
        "hardware": "TPU v5e (1 chip, axon tunnel)",
    }, indent=1))


if __name__ == "__main__":
    main()
