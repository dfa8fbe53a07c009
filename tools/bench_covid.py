"""COVID-19 flagship benchmark: env-steps/s/chip on the reference's GPU
training configuration (51 US states + federal planner, episode 540,
60 replicas — reference run_configs/covid_and_economy_environment.yaml:41-44,
the scenario WarpDrive trains end-to-end on one GPU).

Prints ONE JSON line like bench.py. Run separately from the headline bench:
  python tools/bench_covid.py [--num-envs 60] [--steps 540]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import ai_economist_tpu as aet
from ai_economist_tpu.adapters.batched import BatchedEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=60)
    ap.add_argument("--steps", type=int, default=540)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--fused", action="store_true",
                    help="scan-fused marginal methodology (no per-step dispatch)")
    args = ap.parse_args()

    env = aet.make_env_instance(
        "CovidAndEconomySimulation",
        components=[
            ("ControlUSStateOpenCloseStatus", {"action_cooldown_period": 28}),
            ("FederalGovernmentSubsidy",
             {"num_subsidy_levels": 20, "subsidy_interval": 90,
              "max_annual_subsidy_per_person": 20000}),
            ("VaccinationCampaign",
             {"daily_vaccines_per_million_people": 3000,
              "delivery_interval": 1,
              "vaccine_delivery_start_date": "2021-01-12"}),
        ],
        n_agents=51,
        world_size=[1, 1],
        episode_length=540,
        multi_action_mode_planner=False,
        path_to_data_and_fitted_params=(
            "/root/reference/ai_economist/datasets/covid19_datasets/"
            "data_and_fitted_params"
        ),
        use_real_world_data=False,
        use_real_world_policies=False,
    )
    batch = BatchedEnv(env, args.num_envs, auto_reset=True)
    key = jax.random.PRNGKey(0)
    states, obs = batch.reset(key)

    @jax.jit
    def random_actions(key, obs):
        ka, kp = jax.random.split(key)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        a = jax.random.categorical(ka, logits, axis=-1)
        plogits = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
        p = jax.random.categorical(kp, plogits, axis=-1)
        return {"a": a, "p": p}

    for _ in range(args.warmup):
        key, k = jax.random.split(key)
        states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
    jax.block_until_ready(states.t)

    if args.fused:
        # Scan-fused marginal methodology (see tools/bench_rbc.py): the
        # whole masked-sampling + step + auto-reset loop runs as ONE
        # program with the state threaded and a reward checksum consumed —
        # per-step dispatch latency (the axon tunnel's ~1.4-2.4 ms floor)
        # is paid once per call, and the reported rate is the marginal
        # cost over a T spread, which a result cache cannot fake.
        from ai_economist_tpu.adapters.batched import auto_reset_step

        initial = batch._initial_states

        @jax.jit
        def run(states, obs, initial, keys):
            def body(carry, k):
                states, obs = carry
                acts = random_actions(k, obs)
                states, obs, rew, done, _ = auto_reset_step(
                    env, states, acts, initial, batch.reset_mode)
                return (states, obs), rew["a"].sum()
            (states, obs), out = jax.lax.scan(body, (states, obs), keys)
            return states, obs, out.sum()

        def timed(T, seed):
            best = float("inf")
            kk = jax.random.split(jax.random.PRNGKey(seed), T)
            s, o, t_ = run(states, obs, initial, kk)
            jax.block_until_ready(t_)
            for r in range(3):
                kk = jax.random.split(jax.random.PRNGKey(seed + 1 + r), T)
                t0 = time.perf_counter()
                s, o, tot = run(states, obs, initial, kk)
                jax.block_until_ready((s, tot))
                best = min(best, time.perf_counter() - t0)
            return best

        T1, T2 = args.steps // 4, args.steps
        dt1, dt2 = timed(T1, 7), timed(T2, 8)
        sps = args.num_envs * (T2 - T1) / max(dt2 - dt1, 1e-9)
        dt = dt2
    else:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
        jax.block_until_ready(states.t)
        dt = time.perf_counter() - t0
        sps = args.num_envs * args.steps / dt
    print(json.dumps({
        "metric": f"env-steps/s/chip covid 51states x {args.num_envs}env ep540",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
    }))


if __name__ == "__main__":
    main()
