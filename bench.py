"""Benchmark: env-steps/s/chip on gather-trade-build, 4 agents x 4096 envs.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

METHODOLOGY (round 5, the single methodology for every bench in this repo —
gather-trade-build here, covid in tools/bench_covid.py, RBC in
tools/bench_rbc.py): SCAN-FUSED MARGINAL. The whole
sample-masked-actions -> step -> auto-reset pipeline runs as one lax.scan
with the state threaded through and a reward checksum consumed (the only
structure whose timing the axon tunnel cannot fake); per-step keys are
pre-staged on device; the rate is the marginal cost
(t(T2) - t(T1)) / (T2 - T1), min-of-3 per T, which cancels dispatch latency
and fixed per-call staging. The host-loop rate (the r1-r4 headline
methodology) is also reported as `host_loop_value` — for this
compute-dominated config the two agree within noise, unlike sub-ms steps
where host loops measure dispatch (see BENCH_rbc_r04).

`vs_baseline` is measured-over-measured: the denominator is the ACTUAL
reference CPU engine (/root/reference, salesforce/ai-economist v1.7.1) run in
this same process under the identical env config and the identical
masked-uniform-random action distribution (its hot loop:
reference base_env.py:929-1032). The measurement is cached in
BASELINE_MEASURED.json so repeated bench runs don't re-pay the CPU episode;
delete that file to force a re-measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv

NUM_ENVS = 4096
N_AGENTS = 4
STEPS = 60
WARMUP = 5
WORLD_SIZE = [25, 25]
EPISODE_LENGTH = 1000
REF_STEPS = 300  # reference CPU steps to time (~1-2 s at its ~200 steps/s)
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_MEASURED.json")

COMPONENTS = [
    ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
    ("ContinuousDoubleAuction", {"max_num_orders": 5}),
    ("Gather", {"skill_dist": "pareto"}),
    ("PeriodicBracketTax", {"period": 100}),
]

ENV_COMMON = dict(
    n_agents=N_AGENTS,
    world_size=WORLD_SIZE,
    episode_length=EPISODE_LENGTH,
)

_BASELINE_KEY = (
    f"gather-trade-build {N_AGENTS}ag {WORLD_SIZE[0]}x{WORLD_SIZE[1]} "
    f"cda5 tax100 ep{EPISODE_LENGTH}"
)


def build_env():
    components = [(n, dict(k)) for n, k in COMPONENTS
                  if aet.components.has(n)]
    return aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=components,
        **ENV_COMMON,
    )


def measure_reference(steps=REF_STEPS):
    """Time the real reference CPU engine on the same config + action dist.

    Imports /root/reference with the lz4/Crypto/GPUtil stubs (they only touch
    log IO / the activation gate / device detection) via the same bridge the
    parity tests use, then times `steps` calls of BaseEnvironment.step
    (reference base_env.py:929-1032) under masked uniform-random actions.
    """
    from tests.reference_compat import refbridge

    foundation = refbridge.get_foundation()
    ref_env = foundation.make_env_instance(
        scenario_name="uniform/simple_wood_and_stone",
        components=[{n: dict(k)} for n, k in COMPONENTS],
        multi_action_mode_agents=False,
        multi_action_mode_planner=True,
        flatten_observations=True,
        flatten_masks=True,
        **ENV_COMMON,
    )
    np.random.seed(0)
    obs = ref_env.reset()
    rng = np.random.default_rng(1)
    tpu_env = build_env()  # only for the planner action layout

    # Warm the action-sampling path and the env's first-step caches.
    for _ in range(3):
        acts, _ = refbridge.sample_masked_actions(
            obs, N_AGENTS, rng, tpu_env.planner_action_space)
        obs, _, _, _ = ref_env.step(acts)

    # Time the step loop with fresh masked sampling each step (so the action
    # distribution is exactly the one the TPU bench uses), then subtract the
    # sampling cost re-timed over the recorded observations — only
    # BaseEnvironment.step should be on the reference's clock, since the TPU
    # side's sampling is a fused jitted categorical.
    # Best of 3 repeats — the max is the measurement most favorable to the
    # reference (shields the ratio from transient load on this box).
    best = 0.0
    for _ in range(3):
        seen_obs = []
        t0 = time.perf_counter()
        for _ in range(steps):
            seen_obs.append(obs)
            acts, _ = refbridge.sample_masked_actions(
                obs, N_AGENTS, rng, tpu_env.planner_action_space)
            obs, _, _, _ = ref_env.step(acts)
        dt_total = time.perf_counter() - t0

        rng2 = np.random.default_rng(1)
        t0 = time.perf_counter()
        for o in seen_obs:
            refbridge.sample_masked_actions(
                o, N_AGENTS, rng2, tpu_env.planner_action_space)
        dt_sampling = time.perf_counter() - t0
        best = max(best, steps / max(dt_total - dt_sampling, 1e-9))
    return best


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("config") == _BASELINE_KEY:
            return cached["ref_env_steps_per_s"]
    try:
        # The reference prints device-detection chatter at import; keep
        # stdout clean for the single JSON result line.
        import contextlib
        with contextlib.redirect_stdout(sys.stderr):
            ref_sps = measure_reference()
    except Exception as e:  # reference tree unavailable (e.g. deployment box)
        sys.stderr.write(f"bench: reference measurement failed ({e!r}); "
                         f"falling back to conservative 200 steps/s\n")
        return 200.0
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"config": _BASELINE_KEY,
                   "ref_env_steps_per_s": round(ref_sps, 2),
                   "ref_steps_timed": REF_STEPS,
                   "measured_on": "single-process CPU, this machine"}, f,
                  indent=1)
        f.write("\n")
    return ref_sps


def main():
    ref_sps = get_baseline()

    env = build_env()
    batch = BatchedEnv(env, NUM_ENVS, auto_reset=True)
    key = jax.random.PRNGKey(0)
    states, obs = batch.reset(key)

    p_layout = env.planner_action_space

    def random_actions(key, obs):
        ka, kp = jax.random.split(key)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        a = jax.random.categorical(ka, logits, axis=-1)
        acts = {"a": a}
        if p_layout.n_subspaces > 0:
            plogits = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
            # Multi-action planner: sample per subspace.
            outs = []
            off = 0
            for dim in p_layout.action_dims:
                outs.append(
                    jax.random.categorical(kp, plogits[..., off : off + dim], axis=-1)
                )
                off += dim
            acts["p"] = jnp.stack(outs, axis=-1)
        return acts

    random_actions = jax.jit(random_actions)

    # ---- host-loop rate (r1-r4 methodology; consistency check) ----------
    for i in range(WARMUP):
        key, k = jax.random.split(key)
        states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
    jax.block_until_ready(states.t)

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, k = jax.random.split(key)
        states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
    jax.block_until_ready(states.t)
    dt = time.perf_counter() - t0
    host_loop = NUM_ENVS * STEPS / dt

    # ---- scan-fused marginal rate (the headline methodology) ------------
    from ai_economist_tpu.adapters.batched import auto_reset_step

    initial_states = batch._initial_states

    @jax.jit
    def run(states, obs, keys):
        def body(carry, k):
            states, obs = carry
            acts = random_actions(k, obs)
            states, obs, rew, done, _ = auto_reset_step(
                env, states, acts, initial_states, batch.reset_mode
            )
            return (states, obs), rew["a"].sum()
        (states, obs), tot = jax.lax.scan(body, (states, obs), keys)
        return states, obs, tot.sum()

    def timed(T, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), T)
        jax.block_until_ready(keys)
        out = run(states, obs, keys)  # compile/warm this T
        jax.block_until_ready(out[2])
        best = float("inf")
        for r in range(3):
            keys2 = jax.random.split(jax.random.PRNGKey(seed + 100 + r), T)
            jax.block_until_ready(keys2)
            t0 = time.perf_counter()
            out = run(states, obs, keys2)
            jax.block_until_ready(out[2])
            best = min(best, time.perf_counter() - t0)
        return best

    T1, T2 = 60, 240
    dt1, dt2 = timed(T1, 11), timed(T2, 12)
    fused = NUM_ENVS * (T2 - T1) / max(dt2 - dt1, 1e-9)

    print(
        json.dumps(
            {
                "metric": f"env-steps/s/chip gather-trade-build {N_AGENTS}ag x {NUM_ENVS}env",
                "value": round(fused, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(fused / ref_sps, 2),
                "method": "scan-fused marginal (T 60->240, min-of-3)",
                "host_loop_value": round(host_loop, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
