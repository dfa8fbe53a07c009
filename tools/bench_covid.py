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
