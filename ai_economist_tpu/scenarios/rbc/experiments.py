"""RBC experiment utilities: hparam sweeps, job dirs, config round-trips.

Mirrors the reference's experiment harness
(real_business_cycle/experiment_utils.py:56-246, train_single_exp.py,
train_multi_exps.py): Cartesian-product sweep generation, per-job directories
with a saved config, and consistency checks over saved rollouts.
"""

from __future__ import annotations

import itertools
import json
import os
from dataclasses import asdict, replace
from typing import Any, Dict, Iterable, List

import numpy as np

from ai_economist_tpu.scenarios.rbc.env import RBCConfig
from ai_economist_tpu.scenarios.rbc.trainer import RBCTrainConfig


def sweep_cfg_generator(
    base_env: RBCConfig,
    base_train: RBCTrainConfig,
    sweep: Dict[str, Iterable],
) -> List[Dict[str, Any]]:
    """Cartesian-product sweep over env/train fields
    (experiment_utils.py:172-229)."""
    keys = list(sweep.keys())
    jobs = []
    for combo in itertools.product(*[list(sweep[k]) for k in keys]):
        env_over, train_over = {}, {}
        for k, v in zip(keys, combo):
            if hasattr(base_env, k):
                env_over[k] = v
            elif k in RBCTrainConfig._fields:
                train_over[k] = v
            else:
                raise KeyError(f"unknown sweep key {k}")
        jobs.append(
            dict(
                env=replace(base_env, **env_over),
                train=base_train._replace(**train_over),
                overrides={**env_over, **train_over},
            )
        )
    return jobs


def create_job_dir(root: str, job: Dict[str, Any]) -> str:
    """Create a job directory with hparams.json (experiment_utils.py:230-246)."""
    tag = "_".join(f"{k}={v}" for k, v in job["overrides"].items()) or "base"
    path = os.path.join(root, tag)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "hparams.json"), "w") as f:
        json.dump(
            {"env": asdict(job["env"]), "train": job["train"]._asdict(),
             "overrides": job["overrides"]},
            f, indent=2, default=str,
        )
    return path


def load_job_cfg(path: str):
    with open(os.path.join(path, "hparams.json")) as f:
        d = json.load(f)
    env_d = d["env"]
    for k in ("consumption_levels", "work_levels", "price_levels",
              "wage_levels", "capital_levels", "tax_levels"):
        env_d[k] = tuple(float(x) for x in env_d[k])
    return RBCConfig(**env_d), RBCTrainConfig(**{
        k: type(getattr(RBCTrainConfig(), k))(v) for k, v in d["train"].items()
    })


def check_global_state_consistency(traj_obs: Dict[str, np.ndarray], n_firms: int):
    """All agent classes must observe the same global state each step
    (experiment_utils.py:122-143)."""
    g_dim = 4 * n_firms + 3
    cons = np.asarray(traj_obs["consumer"])[..., :g_dim]
    firm = np.asarray(traj_obs["firm"])[..., :g_dim]
    govt = np.asarray(traj_obs["government"])[..., :g_dim]
    np.testing.assert_allclose(cons[..., 0, :], govt, rtol=1e-5)
    np.testing.assert_allclose(firm[..., 0, :], govt, rtol=1e-5)
    return True
