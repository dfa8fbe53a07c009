"""Per-phase profiling of the bench config (VERDICT round-1 item 3).

Times each pipeline phase (component steps, scenario step, obs packaging,
rewards) as separately jitted vmapped closures on the bench state, plus the
full fused step, on whatever backend jax defaults to (TPU under axon).

Usage: python tools/profile_bench.py [--steps 30]
Prints a JSON breakdown to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv

NUM_ENVS = 4096
N_AGENTS = 4

COMPONENTS = [
    ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
    ("ContinuousDoubleAuction", {"max_num_orders": 5}),
    ("Gather", {"skill_dist": "pareto"}),
    ("PeriodicBracketTax", {"period": 100}),
]


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# v5e per-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM BW).
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def cost_analysis(fn, *args):
    """XLA-reported (flops, bytes accessed) for the compiled fn.

    Caveats, reflected in the roofline fields: XLA counts LOGICAL bytes
    (reuse not deduplicated, padding not included) and does not model
    custom calls (the Pallas windows kernel reports ~0 here — its traffic
    is accounted separately in `pallas_windows_bytes_note`)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def roofline(results, key, fn, *args):
    """Attach bytes/flops + implied fraction-of-peak for phase `key`
    (which must already hold the measured `<key>_ms`)."""
    flops, byts = cost_analysis(fn, *args)
    if flops is None:
        return
    dt_s = results[f"{key}_ms"] / 1e3
    results[f"{key}_gbytes"] = byts / 1e9
    results[f"{key}_gflops"] = flops / 1e9
    results[f"{key}_hbm_frac"] = (byts / dt_s / 1e9) / V5E_HBM_GBPS
    results[f"{key}_mxu_frac"] = (flops / dt_s / 1e12) / V5E_BF16_TFLOPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--num-envs", type=int, default=NUM_ENVS)
    args = ap.parse_args()

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[(n, dict(k)) for n, k in COMPONENTS],
        n_agents=N_AGENTS,
        world_size=[25, 25],
        episode_length=1000,
    )
    batch = BatchedEnv(env, args.num_envs, auto_reset=True)
    key = jax.random.PRNGKey(0)
    states, obs = batch.reset(key)

    p_layout = env.planner_action_space

    @jax.jit
    def random_actions(key, obs):
        ka, kp = jax.random.split(key)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        a = jax.random.categorical(ka, logits, axis=-1)
        acts = {"a": a}
        if p_layout.n_subspaces > 0:
            plogits = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
            outs = []
            off = 0
            for dim in p_layout.action_dims:
                outs.append(jax.random.categorical(kp, plogits[..., off:off + dim], axis=-1))
                off += dim
            acts["p"] = jnp.stack(outs, axis=-1)
        return acts

    acts = random_actions(key, obs)
    jax.block_until_ready(acts)

    results = {}

    # Full fused step.
    def full(states, acts):
        s, o, r, d, _ = batch.step(states, acts)
        return s, o

    dt = timeit(jax.jit(full), states, acts, n=args.steps)
    results["full_step_ms"] = dt * 1e3
    results["env_steps_per_s"] = args.num_envs / dt
    roofline(results, "full_step", full, states, acts)

    # Step without obs/rewards: component pipeline + scenario only.
    def decode(acts):
        a_dec = env.layouts["BasicMobileAgent"].decode(acts["a"])
        p_dec = env.layouts["BasicPlanner"].decode(acts["p"])
        return a_dec, p_dec

    def phase_components(states, acts):
        def one(state, a):
            a_dec, p_dec = decode(a)
            key, k_scen, *k_comps = jax.random.split(state.key, 2 + len(env.components))
            state = state.replace(t=state.t + 1, key=key)
            for comp, kc in zip(env.components, k_comps):
                sub_a = {n: a_dec[n] for n in a_dec if n.split(".")[0] == comp.name}
                sub_p = {n: p_dec[n] for n in p_dec if n.split(".")[0] == comp.name}
                state = comp.step(state, sub_a, sub_p, kc)
            return state
        return jax.vmap(one)(states, acts)

    dt_all = timeit(jax.jit(phase_components), states, acts, n=args.steps)
    results["all_components_ms"] = dt_all * 1e3
    roofline(results, "all_components", phase_components, states, acts)

    # Per-component isolation.
    for comp in env.components:
        def phase_one(states, acts, comp=comp):
            def one(state, a):
                a_dec, p_dec = decode(a)
                kc = jax.random.fold_in(state.key, 1)
                sub_a = {n: a_dec[n] for n in a_dec if n.split(".")[0] == comp.name}
                sub_p = {n: p_dec[n] for n in p_dec if n.split(".")[0] == comp.name}
                return comp.step(state, sub_a, sub_p, kc)
            return jax.vmap(one)(states, acts)
        dt = timeit(jax.jit(phase_one), states, acts, n=args.steps)
        results[f"component_{comp.name}_ms"] = dt * 1e3
        roofline(results, f"component_{comp.name}", phase_one, states, acts)

    # Scenario step.
    def phase_scen(states):
        def one(state):
            return env.scenario.step(state, jax.random.fold_in(state.key, 2))
        return jax.vmap(one)(states)
    results["scenario_step_ms"] = timeit(jax.jit(phase_scen), states, n=args.steps) * 1e3
    roofline(results, "scenario_step", phase_scen, states)

    # Observations (incl. masks + packaging).
    def phase_obs(states):
        return jax.vmap(env.observations)(states)
    results["observations_ms"] = timeit(jax.jit(phase_obs), states, n=args.steps) * 1e3
    roofline(results, "observations", phase_obs, states)
    # The Pallas windows kernel is a custom call XLA's cost model skips;
    # its real HBM traffic at these shapes (packed int32 path): one read of
    # the packed padded map block + the packed window writes + the unpacked
    # f32 output materialization.
    S = -(-14 // 4)
    E = args.num_envs
    kernel_bytes = (S * 42 * 42 * E * 4) + (N_AGENTS * S * 11 * 11 * E * 4) \
        + (N_AGENTS * 14 * 11 * 11 * E * 4)
    results["pallas_windows_bytes_note"] = (
        f"observations includes a Pallas custom call (~{kernel_bytes/1e9:.3f}"
        " GB true traffic at these shapes) that XLA's cost analysis omits"
    )

    # Masks alone.
    def phase_masks(states):
        return jax.vmap(env.action_masks)(states)
    results["masks_ms"] = timeit(jax.jit(phase_masks), states, n=args.steps) * 1e3

    # Rewards.
    def phase_rew(states):
        def one(state):
            return env.scenario.reward(state)
        return jax.vmap(one)(states)
    results["rewards_ms"] = timeit(jax.jit(phase_rew), states, n=args.steps) * 1e3
    roofline(results, "rewards", phase_rew, states)

    # Action sampling.
    results["action_sampling_ms"] = timeit(random_actions, key, obs, n=args.steps) * 1e3

    results["num_envs"] = args.num_envs
    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
