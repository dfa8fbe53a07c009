"""Quick HBM accounting for train_iteration phases at a given env count.

Usage: python tools/mem_train.py [--num-envs 1024]
Prints temp/arg/output bytes for rollout, update, and the full iteration.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax.numpy as jnp
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--config",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "ai_economist_tpu", "training",
                                         "configs", "phase1.yaml"))
    args = ap.parse_args()

    from ai_economist_tpu.training import run as R
    from ai_economist_tpu.training.ppo import gae

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("trainer", {})["num_envs"] = args.num_envs
    trainer = R.build_trainer(cfg)
    env = trainer.env
    B, N, T = trainer.num_envs, env.n_agents, trainer.cfg.rollout_len
    ts = trainer.init(jax.random.PRNGKey(0))

    def stats(tag, fn, *a):
        ma = jax.jit(fn).lower(*a).compile().memory_analysis()
        print(f"{tag:16s} temps={ma.temp_size_in_bytes/1e9:7.3f} GB  "
              f"args={ma.argument_size_in_bytes/1e9:6.3f} GB  "
              f"out={ma.output_size_in_bytes/1e9:6.3f} GB")

    stats("rollout", lambda ts, k: trainer._rollout(ts, k),
          ts, jax.random.PRNGKey(1))
    roll = jax.jit(lambda ts, k: trainer._rollout(ts, k))
    live, batch = roll(ts, jax.random.PRNGKey(1))
    jax.block_until_ready(batch["act_a"])

    def gae_fn(batch):
        done_a = jnp.repeat(batch["done"], N, axis=-1).reshape(T, B * N)
        return gae(batch["rew_a"], batch["val_a"], done_a,
                   batch["last_val_a"], trainer.cfg.gamma,
                   trainer.cfg.gae_lambda)

    adv_a, ret_a = jax.jit(gae_fn)(batch)

    def update(params, opt, obs_seq, act, logp, adv, ret):
        # Epochs as lax.scan, mirroring train_iteration (unrolled epoch
        # bodies trip a TPU compiler memory-space-assignment bug).
        def epoch(carry, k_e):
            params, opt = carry
            params, opt, _ = trainer._update_policy(
                trainer.model_a, params, opt, obs_seq, ts.carry_a,
                act, logp, adv, ret, 0.025, k_e,
                model_seq=trainer.model_a_seq)
            return (params, opt), None
        (params, opt), _ = jax.lax.scan(
            epoch, (params, opt),
            jax.random.split(jax.random.PRNGKey(2), trainer.cfg.epochs))
        return params, opt

    stats("update", update, ts.params_a, ts.opt_a, batch["obs_a"],
          batch["act_a"], batch["logp_a"], adv_a, ret_a)
    stats("train_iteration",
          lambda ts: trainer.train_iteration(ts, 0.025, 0.025)[0], ts)


if __name__ == "__main__":
    main()
