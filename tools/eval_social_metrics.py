"""Evaluate a trained run's social metrics: equality, productivity, eq x prod.

The paper's headline comparison (two_level_curriculum_learning_with_rllib.md;
reference scenario metrics dynamic_layout.py:647-702): the AI-Economist tax
planner should raise equality x productivity over the free-market baseline.
Rolls E greedy evaluation episodes with the run's restored policies and
averages the scenario's social metrics at episode end.

Episodes step at BATCH level (scan over T outside the episode vmap), exactly
like training's auto_reset_step: `env.maybe_saez_refresh` is applied before
every vmapped step, so runs whose config hoists the saez day-1 formula out
of the step (saez_rates_external=True, injected by build_trainer for saez
configs) evaluate under the live tax schedule rather than rates frozen at
reset (round-4 advisor finding).

Usage: python tools/eval_social_metrics.py <run_dir> [--episodes 32]
           [--step N]   # evaluate a specific checkpoint iteration
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

METRIC_KEYS = (
    "social/productivity",
    "social/equality",
    "social_welfare/coin_eq_times_productivity",
)


def evaluate(trainer, ts, episodes: int, seed: int = 1234,
             annealing: str = "completed"):
    """Greedy-rollout `episodes` episodes in one batch; returns metric arrays.

    annealing="completed" (default) evaluates with the tax-annealing
    curriculum fully visible: fresh episodes reset with completions=0, and
    both the planner's annealed action mask
    (components/redistribution.py:646-668) and curr_rate_max gate on
    state.completions — without this override every rate except 0% is
    masked, so a phase-2 eval silently measures a TAX-FREE episode with
    tax-trained agents (this is what the round-4 phase-2 eval table
    measured; discovered round 5). Training ends with completions far past
    full visibility, so the trained equilibrium is the completed-annealing
    one. annealing="fresh" keeps completions=0 (the old protocol), useful
    as the taxes-off ablation.
    """
    env = trainer.env
    N = env.n_agents

    def fold2(tree):
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)

    def run(keys):
        E = keys.shape[0]
        states, obs = jax.vmap(env.reset_fresh)(keys)
        if annealing == "completed":
            states = states.replace(
                completions=jnp.full_like(states.completions, 1 << 24))
            # Re-derive obs: the reset-time action masks were computed at
            # completions=0 and would zero-mask the first tax day.
            obs = jax.vmap(env.observations)(states)
        carry_a = trainer.model_a.initial_carry(E * N)
        carry_p = trainer.model_p.initial_carry(E)

        def step_fn(carry, _):
            states, obs, ca, cp = carry
            obs_a = fold2({k: obs["a"][k] for k in obs["a"] if k != "pa"})
            logits_a, _, ca = trainer.model_a.apply(ts.params_a, obs_a, ca)
            act = {"a": jnp.argmax(logits_a, -1).reshape(E, N).astype(jnp.int32)}
            if trainer.has_planner_actions:
                logits_p, _, cp = trainer.model_p.apply(ts.params_p, obs["p"], cp)
                outs, off = [], 0
                for dim in trainer.p_layout.action_dims:
                    outs.append(jnp.argmax(logits_p[:, off:off + dim], -1))
                    off += dim
                act["p"] = jnp.stack(outs, axis=-1).astype(jnp.int32)
            states = env.maybe_saez_refresh(states)
            nstates, nobs, rew, done, _ = jax.vmap(env.step)(states, act)
            return (nstates, nobs, ca, cp), None

        (states, *_), _ = jax.lax.scan(
            step_fn, (states, obs, carry_a, carry_p), None,
            length=env.episode_length,
        )
        m = jax.vmap(env.metrics)(states)
        return {k: m[k] for k in METRIC_KEYS}, states

    keys = jax.random.split(jax.random.PRNGKey(seed), episodes)
    return jax.jit(run)(keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--episodes", type=int, default=32)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint iteration to evaluate (default: latest)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--annealing", choices=["completed", "fresh"],
                    default="completed",
                    help="completed: tax annealing fully visible (the "
                         "trained equilibrium); fresh: completions=0 "
                         "(zero-tax ablation, the pre-r5 protocol)")
    args = ap.parse_args()

    from ai_economist_tpu.training import run as R
    from ai_economist_tpu.utils.checkpoint import CheckpointManager

    cfg = R.load_config(args.run_dir)
    trainer = R.build_trainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(os.path.abspath(args.run_dir), "ckpts"))
    step = args.step if args.step is not None else mgr.latest_step()
    ts = mgr.restore(ts, step)
    mgr.close()

    out, _ = evaluate(trainer, ts, args.episodes, args.seed,
                      annealing=args.annealing)
    res = {
        "run": os.path.basename(os.path.abspath(args.run_dir)),
        "restored_iteration": int(step),
        "episodes": args.episodes,
        "annealing": args.annealing,
        **{k.split("/")[-1]: round(float(np.mean(np.asarray(v))), 4)
           for k, v in out.items()},
        **{k.split("/")[-1] + "_std": round(float(np.std(np.asarray(v))), 4)
           for k, v in out.items()},
        **{k.split("/")[-1] + "_sem": round(
            float(np.std(np.asarray(v)) / np.sqrt(args.episodes)), 4)
           for k, v in out.items()},
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
