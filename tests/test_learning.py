"""Training-shows-learning evidence (VERDICT round-1 item 8).

Small but real runs asserting mean reward IMPROVES under training — the
reference demonstrates this with its phase-1 free-market curriculum
(tutorials/rllib/phase1/config.yaml) and the RBC consumer PPO
(real_business_cycle/rbc/cuda_manager.py:1383-1916); finite losses alone do
not establish that the training stack learns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet


@pytest.mark.slow
def test_gather_build_training_improves_reward():
    """Free-market gather-and-build (phase-1 analog, planner off): mean agent
    reward over the rollout batch must rise materially from the first
    iterations to the last."""
    from ai_economist_tpu.training.ppo import PPOConfig
    from ai_economist_tpu.training.trainer import TwoLevelTrainer

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {"payment": 10, "skill_dist": "none", "build_labor": 1.0}),
            ("Gather", {"move_labor": 0.1, "collect_labor": 0.1}),
        ],
        n_agents=4,
        world_size=[12, 12],
        episode_length=50,
        energy_cost=0.1,
        isoelastic_eta=0.0,
    )
    trainer = TwoLevelTrainer(
        env,
        num_envs=16,
        cfg=PPOConfig(rollout_len=50, epochs=2, lr=1e-3, entropy_coef=0.01),
        model=("mlp", "random"),
        train_planner=False,
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    rews = []
    for it in range(30):
        ts, metrics = trainer.train_iteration(ts, 0.01, 0.0)
        rews.append(float(metrics["reward_a_mean"]))
    early = float(np.mean(rews[:3]))
    late = float(np.mean(rews[-3:]))
    assert np.isfinite(late)
    # "Materially": at least +50% over the random-policy starting level, and
    # strictly positive progress.
    assert late > early + 0.5 * abs(early) + 1e-3, (early, late, rews)


@pytest.mark.slow
def test_rbc_consumer_training_improves_reward():
    """RBC consumers (utility = CRRA consumption - labor) improve under the
    per-class PPO (cuda_manager.py:1383-1916 analog)."""
    from ai_economist_tpu.scenarios.rbc import (
        RBCConfig,
        RBCEnvironment,
        RBCTrainConfig,
        RBCTrainer,
    )

    cfg = RBCConfig(
        n_consumers=8, n_firms=4, episode_length=20,
        initial_firm_endowment=22.0 * 1000 * 8,
    )
    env = RBCEnvironment(cfg)
    trainer = RBCTrainer(
        env,
        RBCTrainConfig(batch_size=16, lr=3e-3, entropy=0.003,
                       firm_training_start=10_000,
                       government_training_start=10_000),
    )
    params, opt = trainer.init(jax.random.PRNGKey(0))
    rews = []
    for ep in range(25):
        key = jax.random.fold_in(jax.random.PRNGKey(1), ep)
        params, opt, metrics = trainer.train_episode(
            params, opt, key, jnp.asarray(ep), jnp.asarray(1.0)
        )
        rews.append(float(metrics["consumer/return"]))
    early = float(np.mean(rews[:3]))
    late = float(np.mean(rews[-3:]))
    assert np.isfinite(late)
    assert late > early, (early, late, rews)
