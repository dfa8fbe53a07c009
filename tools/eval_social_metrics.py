"""Evaluate a trained run's social metrics: equality, productivity, eq x prod.

The paper's headline comparison (two_level_curriculum_learning_with_rllib.md;
reference scenario metrics dynamic_layout.py:647-702): the AI-Economist tax
planner should raise equality x productivity over the free-market baseline.
Rolls E greedy evaluation episodes with the run's restored policies and
averages the scenario's social metrics at episode end.

Usage: python tools/eval_social_metrics.py <run_dir> [--episodes 32]
Prints one JSON line; append-friendly for RESULTS.md.
"""

import argparse
import json
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--episodes", type=int, default=32)
    args = ap.parse_args()

    from ai_economist_tpu.training import run as R

    cfg = R.load_config(args.run_dir)
    trainer = R.build_trainer(cfg)
    mgr, _dense, ts, start = R.set_up_dirs_and_maybe_restore(
        args.run_dir, cfg, trainer, jax.random.PRNGKey(0)
    )
    mgr.close()
    env = trainer.env

    def rollout(key):
        k0, key = jax.random.split(key)
        state, obs = env.reset_fresh(k0)
        carry_a = trainer.model_a.initial_carry(env.n_agents)
        carry_p = trainer.model_p.initial_carry(1)

        def step_fn(carry, _):
            state, obs, ca, cp = carry
            logits_a, _, ca = trainer.model_a.apply(
                ts.params_a,
                {k: obs["a"][k] for k in obs["a"] if k != "pa"},
                ca,
            )
            act = {"a": jnp.argmax(logits_a, -1).astype(jnp.int32)}
            if trainer.has_planner_actions:
                obs_p = {k: v[None] for k, v in obs["p"].items()}
                logits_p, _, cp = trainer.model_p.apply(ts.params_p, obs_p, cp)
                outs, off = [], 0
                for dim in trainer.p_layout.action_dims:
                    outs.append(jnp.argmax(logits_p[0, off:off + dim], -1))
                    off += dim
                act["p"] = jnp.stack(outs).astype(jnp.int32)
            nstate, nobs, rew, done, _ = env.step(state, act)
            return (nstate, nobs, ca, cp), None

        (state, *_), _ = jax.lax.scan(
            step_fn, (state, obs, carry_a, carry_p), None,
            length=env.episode_length,
        )
        m = env.metrics(state)
        return {
            k: m[k] for k in (
                "social/productivity", "social/equality",
                "social_welfare/coin_eq_times_productivity",
            )
        }

    keys = jax.random.split(jax.random.PRNGKey(1234), args.episodes)
    out = jax.jit(jax.vmap(rollout))(keys)
    res = {
        "run": os.path.basename(os.path.abspath(args.run_dir)),
        "restored_iteration": int(start),
        "episodes": args.episodes,
        **{k.split("/")[-1]: round(float(np.mean(np.asarray(v))), 4)
           for k, v in out.items()},
        **{k.split("/")[-1] + "_std": round(float(np.std(np.asarray(v))), 4)
           for k, v in out.items()},
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
