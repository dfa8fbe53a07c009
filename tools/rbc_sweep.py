"""RBC hyperparameter sweep through the experiment harness.

The analog of the reference's multi-experiment runner
(real_business_cycle/train_multi_exps.py:22 + experiment_utils.py:81-246):
generate a Cartesian sweep at the reference's all-agents template scale
(10 firms, 100 consumers, 1 government — rbc/constants.py:15), create one
job directory per combo with saved hparams, train each job, and verify
`check_global_state_consistency` on a saved rollout from the trained
policies. Where the reference fans jobs out over GPUs in parallel
processes, here each job is a single jitted program on the one chip and
jobs run back-to-back.

Usage: python tools/rbc_sweep.py [--episodes 60] [--out runs/rbc_sweep_r04]
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

import numpy as np

from ai_economist_tpu.scenarios.rbc import experiments as X
from ai_economist_tpu.scenarios.rbc.env import RBCConfig, RBCEnvironment
from ai_economist_tpu.scenarios.rbc.trainer import RBCTrainConfig, RBCTrainer

# The reference template sweeps training hparams over the fixed
# all-agents-export env (train_multi_exps.py:17-27 sweeps ppo_num_updates;
# its world_param_sweeps toggle env structure). Axes here: the training
# batch (reference batch_size: [128]) and the importer — the env-structure
# toggle its template exposes (constants.py importer config).
# batch_size 1024 OOMs: episode-batch PPO stores the full [240, B, 111]
# trajectory set, measured 51.5 GB at B=1024 vs 15.75 GB HBM. 256 fits.
SWEEP = {
    "batch_size": [128, 256],
    "use_importer": [True, False],
}


def run_job(job, path, episodes, seed=2345):
    env = RBCEnvironment(job["env"])
    trainer = RBCTrainer(env, job["train"])
    hist_path = os.path.join(path, "history.jsonl")
    open(hist_path, "w").close()
    t0 = time.time()

    def cb(ep, m):
        with open(hist_path, "a") as f:
            f.write(json.dumps({"episode": ep, **m}) + "\n")
        if ep % 10 == 0:
            print(f"  ep {ep}: " + " ".join(
                f"{k}={v:.4g}" for k, v in sorted(m.items())
                if k.endswith("/return")), flush=True)

    params, history = trainer.train(jax.random.PRNGKey(seed), episodes, cb)
    dt = time.time() - t0

    # Saved rollout from the trained policies + the reference's global-state
    # consistency check (experiment_utils.py:122-143).
    _, traj = trainer.rollout(params, jax.random.PRNGKey(seed + 1))
    traj_obs = {k: np.asarray(traj[k]["obs"][:, 0]) for k in
                ("consumer", "firm", "government")}
    np.savez_compressed(os.path.join(path, "rollout_obs.npz"), **traj_obs)
    X.check_global_state_consistency(traj_obs, n_firms=job["env"].n_firms)
    first, last = history[0], history[-1]

    def returns(prefix, m):
        return {f"{prefix}_{k.replace('/', '_')}": round(v, 2)
                for k, v in m.items() if k.endswith("/return")}

    return {
        "seconds": round(dt, 1),
        "consistency_ok": True,
        **returns("first", first),
        **returns("final", last),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=60)
    ap.add_argument("--out", default="runs/rbc_sweep_r04")
    args = ap.parse_args()

    base_env = RBCConfig()  # reference all-agents template scale
    base_train = RBCTrainConfig(entropy=0.5, lr=0.001)  # train_multi_exps.py:18-21
    jobs = X.sweep_cfg_generator(base_env, base_train, SWEEP)
    print(f"{len(jobs)} jobs over {list(SWEEP)}", flush=True)

    summary = {}
    for job in jobs:
        path = X.create_job_dir(args.out, job)
        tag = os.path.basename(path)
        print(f"== job {tag}", flush=True)
        summary[tag] = run_job(job, path, args.episodes)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    # Markdown table for RESULTS.md
    keys = sorted(next(iter(summary.values())).keys())
    lines = ["| job | " + " | ".join(keys) + " |",
             "|" + "---|" * (len(keys) + 1)]
    for tag, row in summary.items():
        lines.append("| " + tag + " | " +
                     " | ".join(str(row[k]) for k in keys) + " |")
    with open(os.path.join(args.out, "summary.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
