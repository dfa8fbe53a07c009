"""Per-phase profiling of one PPO train_iteration (VERDICT round-4 item 1a).

Decomposes a training iteration of the two-level trainer the way
profile_bench.py decomposes the env step: separately jitted closures for

  * env_rollout_steps — T auto_reset_step calls with pre-staged actions
    (the env share of the rollout)
  * policy_forward    — T policy forwards (agents + planner) over captured
    rollout observations (the acting share)
  * rollout           — the real interleaved rollout (env + policy + record)
  * gae               — advantage estimation on the captured batch
  * ppo_update        — all PPO epochs on the captured batch (fwd+bwd BPTT)
  * train_iteration   — the full fused iteration, host-loop over threaded
    TrainerState (exactly how training runs, so this IS the sustained rate)

plus XLA cost-analysis rooflines per phase, at any env count.

Usage: python tools/profile_train.py [--config training/configs/phase1.yaml]
           [--num-envs 120] [--iters 6]
Prints one JSON object.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
import yaml

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def timeit(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def cost_analysis(fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def roofline(results, key, fn, *args):
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
    ap.add_argument("--config",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "ai_economist_tpu", "training",
                                         "configs", "phase1.yaml"))
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from ai_economist_tpu.training import run as R
    from ai_economist_tpu.training.ppo import gae

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    if args.num_envs is not None:
        cfg.setdefault("trainer", {})["num_envs"] = args.num_envs
    trainer = R.build_trainer(cfg)
    env = trainer.env
    B, N, T = trainer.num_envs, env.n_agents, trainer.cfg.rollout_len

    ts = trainer.init(jax.random.PRNGKey(0))
    jax.block_until_ready(ts.env_states.t)
    results = {
        "config": os.path.relpath(args.config, "/root/repo"),
        "num_envs": B,
        "rollout_len": T,
        "epochs": trainer.cfg.epochs,
        "env_steps_per_iteration": B * T,
        "backend": jax.default_backend(),
    }

    # ---- full iteration: host loop over threaded state (the real thing) --
    ent = (0.025, 0.025)

    def one_iter(ts):
        nts, _ = trainer.train_iteration(ts, *ent)
        return nts

    # warm separately so compile is excluded
    ts_w = one_iter(ts)
    jax.block_until_ready(ts_w.env_states.t)
    t0 = time.perf_counter()
    cur = ts_w
    for _ in range(args.iters):
        cur = one_iter(cur)
    jax.block_until_ready(cur.env_states.t)
    dt = (time.perf_counter() - t0) / args.iters
    results["train_iteration_ms"] = dt * 1e3
    results["train_env_steps_per_s"] = B * T / dt
    roofline(results, "train_iteration",
             lambda ts: trainer.train_iteration(ts, *ent)[0], ts)

    # ---- rollout only -----------------------------------------------------
    roll = jax.jit(lambda ts, k: trainer._rollout(ts, k))
    k = jax.random.PRNGKey(1)
    results["rollout_ms"] = timeit(roll, ts, k, n=args.iters) * 1e3
    roofline(results, "rollout", lambda ts, k: trainer._rollout(ts, k), ts, k)
    (live, batch) = roll(ts, k)
    jax.block_until_ready(batch["act_a"])

    # ---- env share: T auto-reset steps with the captured actions ----------
    # (batch arrays are explicit jit arguments everywhere below: closing
    # over them would embed ~GB constants in the compile payload.)
    from ai_economist_tpu.adapters.batched import auto_reset_step

    def env_only(env_states, acts_a, acts_p):
        def step_fn(s, xs):
            a_t, p_t = xs
            actions = {"a": a_t.reshape(B, N)}
            if trainer.has_planner_actions:
                actions["p"] = p_t
            s, o, r, d, _ = auto_reset_step(
                env, s, actions, trainer._initial_states, trainer.reset_mode)
            return s, r["a"].sum()
        s, outs = jax.lax.scan(step_fn, env_states, (acts_a, acts_p))
        return s, outs.sum()

    ef = jax.jit(env_only)
    results["env_rollout_steps_ms"] = timeit(
        ef, ts.env_states, batch["act_a"], batch["act_p"], n=args.iters) * 1e3
    roofline(results, "env_rollout_steps", env_only,
             ts.env_states, batch["act_a"], batch["act_p"])

    # ---- policy share: T forwards over the captured obs -------------------
    def policy_fwd(params_a, params_p, obs_a, obs_p, ca, cp):
        def step_fn(carry, xs):
            ca, cp = carry
            obs_a_t, obs_p_t = xs
            la, va, ca = trainer.model_a.apply(params_a, obs_a_t, ca)
            acc = la.sum() + va.sum()
            if trainer.has_planner_actions:
                lp_, vp, cp = trainer.model_p.apply(params_p, obs_p_t, cp)
                acc = acc + lp_.sum() + vp.sum()
            return (ca, cp), acc
        _, accs = jax.lax.scan(step_fn, (ca, cp), (obs_a, obs_p))
        return accs.sum()

    pf = jax.jit(policy_fwd)
    results["policy_forward_ms"] = timeit(
        pf, ts.params_a, ts.params_p, batch["obs_a"], batch["obs_p"],
        ts.carry_a, ts.carry_p, n=args.iters) * 1e3
    roofline(results, "policy_forward", policy_fwd,
             ts.params_a, ts.params_p, batch["obs_a"], batch["obs_p"],
             ts.carry_a, ts.carry_p)

    # ---- GAE ---------------------------------------------------------------
    def gae_fn(batch):
        done_a = jnp.repeat(batch["done"], N, axis=-1).reshape(T, B * N)
        return gae(batch["rew_a"], batch["val_a"], done_a,
                   batch["last_val_a"], trainer.cfg.gamma,
                   trainer.cfg.gae_lambda)

    results["gae_ms"] = timeit(jax.jit(gae_fn), batch, n=args.iters) * 1e3
    adv_a, ret_a = jax.jit(gae_fn)(batch)

    # ---- PPO update: all epochs, agents policy -----------------------------
    def update(params, opt, obs_seq, act, logp, adv, ret):
        # Epochs as lax.scan, mirroring train_iteration.
        def epoch(carry, k_e):
            params, opt = carry
            params, opt, aux = trainer._update_policy(
                trainer.model_a, params, opt, obs_seq, ts.carry_a,
                act, logp, adv, ret, 0.025, k_e,
                model_seq=trainer.model_a_seq)
            return (params, opt), aux
        (params, opt), auxs = jax.lax.scan(
            epoch, (params, opt),
            jax.random.split(jax.random.PRNGKey(2), trainer.cfg.epochs))
        return params, opt, auxs

    upd_args = (ts.params_a, ts.opt_a, batch["obs_a"], batch["act_a"],
                batch["logp_a"], adv_a, ret_a)
    results["ppo_update_ms"] = timeit(
        jax.jit(update), *upd_args, n=args.iters) * 1e3
    roofline(results, "ppo_update", update, *upd_args)

    # ---- residual ----------------------------------------------------------
    accounted = (results["rollout_ms"] + results["gae_ms"]
                 + results["ppo_update_ms"])
    results["dispatch_and_other_ms"] = results["train_iteration_ms"] - accounted
    results["rollout_overhead_ms"] = (
        results["rollout_ms"] - results["env_rollout_steps_ms"]
        - results["policy_forward_ms"])
    results["notes"] = {
        "method": "each phase is its own jit, timed over threaded state "
                  "(min dispatch ~1.4-2.4 ms through the axon tunnel is "
                  "included per call; the fused train_iteration pays it "
                  "once). train_env_steps_per_s is the sustained training "
                  "rate: B*T / full-iteration wall time.",
        "phases": "rollout ~= env_rollout_steps + policy_forward + "
                  "sampling/record overhead; train_iteration ~= rollout + "
                  "gae + ppo_update (+ planner update when trained).",
    }
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
