"""YAML-config training runner with two-phase curriculum support.

TPU-native replacement for the reference's RLlib training entrypoint
(tutorials/rllib/training_script.py:48-336): builds the env + two-policy
trainer from a YAML run config, restores from the latest checkpoint if one
exists, optionally warm-starts agent weights from a phase-1 run
(training_script.py:174-191 / phase2/config.yaml restore_tf_weights_agents),
syncs the distributed Saez buffer between iterations
(training_script.py:202-220), periodically dumps lz4 dense logs
(training_script.py:223-238), and checkpoints the full training pytree
(training_script.py:241-263).

Run:  python -m ai_economist_tpu.training.run <run_dir>
where <run_dir> contains config.yaml (see training/configs/phase{1,2}.yaml).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ai_economist_tpu.core.env import make_env_instance
from ai_economist_tpu.training.ppo import PPOConfig
from ai_economist_tpu.training.trainer import TrainerState, TwoLevelTrainer
from ai_economist_tpu.utils.checkpoint import CheckpointManager, load_params, save_params
from ai_economist_tpu.utils.logs import DenseLogger, save_episode_log


def load_config(run_dir: str) -> Dict[str, Any]:
    with open(os.path.join(run_dir, "config.yaml")) as f:
        return yaml.safe_load(f)


def build_env(cfg: Dict[str, Any]):
    env_cfg = dict(cfg["env"])
    scenario = env_cfg.pop("scenario_name")
    return make_env_instance(scenario, **env_cfg)


def build_trainer(cfg: Dict[str, Any]) -> TwoLevelTrainer:
    t = cfg.get("trainer", {})
    num_envs = int(t.get("num_envs", 32))
    # Auto-wire the Saez global buffer to the replica count: the reference
    # sizes its global buffer to the worker fleet implicitly by concatenating
    # per-worker buffers (utils/remote.py:56-73); here the capacity is static,
    # so default it to num_envs unless the config pins it explicitly.
    cfg = dict(cfg)
    env_section = dict(cfg["env"])
    comps = []
    for spec in env_section.get("components", []):
        if isinstance(spec, dict):
            (name, kw), = spec.items()
        else:
            name, kw = spec
        kw = dict(kw)
        if name == "PeriodicBracketTax" and kw.get("tax_model") == "saez":
            if "saez_global_replicas" not in kw:
                kw["saez_global_replicas"] = num_envs
            # Hoist the day-1 formula out of the vmapped step (a both-branch
            # select there, paid every step x every replica): training always
            # steps through auto_reset_step, which applies the batch-level
            # refresh (core/env.py maybe_saez_refresh).
            kw.setdefault("saez_rates_external", True)
        comps.append((name, kw))
    env_section["components"] = comps
    cfg["env"] = env_section
    env = build_env(cfg)
    ppo_fields = {k: v for k, v in t.items() if k in PPOConfig._fields}
    models = cfg.get("models", {})
    return TwoLevelTrainer(
        env,
        num_envs=num_envs,
        cfg=PPOConfig(**ppo_fields),
        model=(models.get("agents", "conv_lstm"), models.get("planner", "conv_lstm")),
        train_planner=bool(t.get("train_planner", True)),
        model_kwargs=models.get("agents_kwargs"),
        planner_model_kwargs=models.get("planner_kwargs"),
    )


def piecewise(schedule, default):
    """[[iter, value], ...] -> linear-interpolated schedule fn (the RLlib
    PiecewiseSchedule analog used for planner entropy annealing,
    phase2/config.yaml entropy_coeff_schedule)."""
    if not schedule:
        return lambda it: default
    xs = np.asarray([p[0] for p in schedule], np.float64)
    ys = np.asarray([p[1] for p in schedule], np.float64)

    def fn(it):
        return float(np.interp(it, xs, ys))

    return fn


def set_up_dirs_and_maybe_restore(run_dir: str, cfg, trainer, init_key):
    """Create ckpt/log dirs; restore latest trainer state if present;
    otherwise init fresh and maybe warm-start agent params from another run
    (training_script.py:125-199)."""
    ckpt_dir = os.path.join(os.path.abspath(run_dir), "ckpts")
    dense_dir = os.path.join(os.path.abspath(run_dir), "dense_logs")
    os.makedirs(dense_dir, exist_ok=True)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=3)

    ts = trainer.init(init_key)
    start_iter = 0
    if mgr.latest_step() is not None:
        ts = mgr.restore(ts)
        start_iter = int(ts.iteration)
    else:
        warm = cfg.get("general", {}).get("restore_agent_params_from")
        if warm:
            src = warm if os.path.isabs(warm) else os.path.join(run_dir, warm)
            if src.endswith(".msgpack"):
                # tools/launch_distributed.py chief-save format.
                from flax import serialization

                with open(src, "rb") as f:
                    restored = serialization.from_bytes(ts.params_a, f.read())
            else:
                restored = load_params(src, ts.params_a)
            ts = ts.replace(params_a=restored)
    return mgr, dense_dir, ts, start_iter


def maybe_sync_saez_buffer(trainer, ts: TrainerState) -> TrainerState:
    """All-gather per-replica Saez buffers into the shared global buffer
    (utils/remote.py:56-73 analog). No-op unless PeriodicBracketTax with the
    saez model is in the build."""
    try:
        comp = trainer.env.get_component("PeriodicBracketTax")
    except KeyError:
        return ts
    if getattr(comp, "tax_model", None) != "saez":
        return ts
    from ai_economist_tpu.parallel.saez import sync_saez_buffers

    # jit: eagerly this is ~10 separate device dispatches per iteration
    # (argsorts + takes over the [R, R*S, 2] buffers).
    return ts.replace(env_states=jax.jit(sync_saez_buffers)(ts.env_states))


def maybe_store_dense_log(trainer, ts: TrainerState, dense_dir: str, it: int):
    """Roll one full greedy episode with the current policies, record a
    dense log on device, decode + save as lz4 JSON
    (training_script.py:223-238 + utils/saving.py:93-106)."""
    env = trainer.env
    logger = DenseLogger(env)
    T = env.episode_length

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
                obs_p = {k: v[None] for k, v in obs["p"].items()}  # add batch axis
                logits_p, _, cp = trainer.model_p.apply(ts.params_p, obs_p, cp)
                outs, off = [], 0
                for dim in trainer.p_layout.action_dims:
                    outs.append(jnp.argmax(logits_p[0, off : off + dim], -1))
                    off += dim
                act["p"] = jnp.stack(outs).astype(jnp.int32)
            nstate, nobs, rew, done, _ = env.step(state, act)
            rec = logger.record(nstate, act, rew)
            return (nstate, nobs, ca, cp), rec

        (_, _, _, _), recs = jax.lax.scan(
            step_fn, (state, obs, carry_a, carry_p), None, length=T
        )
        return recs

    recs = jax.jit(rollout)(jax.random.fold_in(ts.key, it))
    dense = logger.decode(jax.tree.map(np.asarray, recs))
    path = os.path.join(dense_dir, f"dense_log_iter{it}.lz4")
    save_episode_log(dense, path)
    return path


def maybe_save(mgr: CheckpointManager, run_dir: str, ts: TrainerState, it: int):
    mgr.save(it, ts)
    # Standalone agent params for phase-2 warm starts
    # (utils/saving.py:108-133 analog).
    save_params(os.path.join(os.path.abspath(run_dir), f"agent_params_iter{it}"), ts.params_a)


def main(run_dir: str):
    cfg = load_config(run_dir)
    general = cfg.get("general", {})
    trainer = build_trainer(cfg)

    ent_a = piecewise(
        cfg.get("trainer", {}).get("entropy_schedule_agents"), trainer.cfg.entropy_coef
    )
    ent_p = piecewise(
        cfg.get("trainer", {}).get("entropy_schedule_planner"), trainer.cfg.entropy_coef
    )

    mgr, dense_dir, ts, start = set_up_dirs_and_maybe_restore(
        run_dir, cfg, trainer, jax.random.PRNGKey(int(general.get("seed", 0)))
    )
    num_iters = int(general.get("num_iterations", 100))
    save_every = int(general.get("save_every", 50))
    dense_every = int(general.get("dense_log_every", 0))
    saez_sync = bool(general.get("sync_saez_buffer", True))

    history_path = os.path.join(os.path.abspath(run_dir), "history.jsonl")
    # One record per iteration even across restarts: truncate on a fresh
    # start, and on resume drop any records at/after the resume point
    # (they will be re-emitted by the loop below).
    if start == 0:
        open(history_path, "w").close()
    elif os.path.exists(history_path):
        import json as _json

        def _iter_of(ln):
            # A crash mid-write leaves a truncated final line — exactly the
            # scenario this resume path serves; drop unparsable lines rather
            # than aborting the restart.
            try:
                return _json.loads(ln).get("iteration", -1)
            except ValueError:
                return -1

        with open(history_path) as f:
            kept = [ln for ln in f if ln.strip() and 0 <= _iter_of(ln) < start]
        with open(history_path, "w") as f:
            f.writelines(kept)
    for it in range(start, num_iters):
        ts, metrics = trainer.train_iteration(ts, ent_a(it), ent_p(it))
        if saez_sync:
            ts = maybe_sync_saez_buffer(trainer, ts)
        if it % max(1, int(general.get("log_every", 10))) == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"iter {it}: " + " ".join(f"{k}={v:.4g}" for k, v in sorted(m.items())),
                  flush=True)
            # Learning-curve record (the TensorBoard-result analog,
            # training_script.py:296-327's result dicts).
            import json as _json
            with open(history_path, "a") as f:
                f.write(_json.dumps({"iteration": it, **m}) + "\n")
        if dense_every and it and it % dense_every == 0:
            maybe_store_dense_log(trainer, ts, dense_dir, it)
        if it and it % save_every == 0:
            maybe_save(mgr, run_dir, ts, it)
    maybe_save(mgr, run_dir, ts, num_iters)
    mgr.close()
    return ts


if __name__ == "__main__":
    main(sys.argv[1])
