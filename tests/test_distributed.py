"""Multi-host distributed execution tests (SURVEY §4: "multi-host tests using
jax.distributed with CPU devices").

The multi-process test spawns 2 OS processes x 4 virtual CPU devices each,
joined via jax.distributed + Gloo collectives, and runs the REAL two-level
PPO train step as one SPMD program over the global (host=2, env=4) mesh. Its
results must agree with the same program on a single-process (host=1, env=8)
mesh — the invariant that makes multi-host scaling a pure deployment detail,
which is the TPU-native answer to the reference's Ray fan-out
(reference tutorials/rllib/utils/remote.py:11-73).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from ai_economist_tpu.parallel import distributed as dist

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_global_mesh_single_process_shape():
    mesh = dist.make_global_mesh("env")
    assert mesh.axis_names == (dist.HOST_AXIS, "env")
    assert mesh.shape[dist.HOST_AXIS] == 1
    assert mesh.shape["env"] == len(jax.devices())
    assert dist.num_dp_devices(mesh) == len(jax.devices())
    sl = dist.process_env_slice(16)
    assert (sl.start, sl.stop) == (0, 16)


def test_env_sharding_places_leading_axis():
    mesh = dist.make_global_mesh("env")
    n = len(jax.devices())
    batch = {"x": np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)}
    garr = dist.global_env_batch(batch, mesh)["x"]
    assert garr.shape == (n * 4, 3)
    # one leading-axis shard per device
    assert len(garr.addressable_shards) == n
    shard_rows = sorted(s.data.shape[0] for s in garr.addressable_shards)
    assert shard_rows == [4] * n
    np.testing.assert_array_equal(np.asarray(garr), batch["x"])

    rep = dist.replicate({"w": np.ones((3, 3), np.float32)}, mesh)["w"]
    assert np.asarray(rep).shape == (3, 3)
    got = dist.fetch({"w": rep})["w"]
    np.testing.assert_array_equal(got, np.ones((3, 3)))


def test_single_process_distributed_trainer_runs():
    """init_trainer_distributed + train_iteration on the degenerate 1-host
    mesh: the exact code path multi-host uses, minus the process boundary."""
    from tests.distributed_worker import run_train_steps

    out = run_train_steps(num_iterations=1)
    assert np.isfinite(out["params_a_checksum"])
    assert np.isfinite(out["params_p_checksum"])
    for v in out["final_metrics"].values():
        assert np.isfinite(v)


@pytest.mark.slow
def test_multiprocess_agrees_with_single_process(tmp_path):
    """2 processes x 4 devices vs 1 process x 8 devices: the same global
    program. Param checksums must agree bit-for-bit-ish (collective reduction
    order may differ across process topologies -> tiny float drift)."""
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), "4",
             str(outs[pid]), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=_REPO,
        )
        for pid in range(2)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]

    single = tmp_path / "single.json"
    p = subprocess.run(
        [sys.executable, _WORKER, "0", "1", "0", "8", str(single), "2"],
        capture_output=True, timeout=280, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr.decode()[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    ref = json.loads(single.read_text())

    # Both workers hold identical replicated results (same SPMD program).
    assert results[0]["params_a_checksum"] == results[1]["params_a_checksum"]
    assert results[0]["params_p_checksum"] == results[1]["params_p_checksum"]

    # And the 2-process global program matches the 1-process one.
    for k in ("params_a_checksum", "params_p_checksum"):
        np.testing.assert_allclose(results[0][k], ref[k], rtol=1e-6, err_msg=k)
    for k, v in ref["final_metrics"].items():
        np.testing.assert_allclose(
            results[0]["final_metrics"][k], v, rtol=1e-4, atol=1e-6, err_msg=k
        )


@pytest.mark.slow
def test_launch_distributed_end_to_end(tmp_path):
    """tools/launch_distributed.py: 2 processes x 2 devices run the YAML
    training config as one SPMD program, the chief logs history and saves
    replicated params, and both workers exit cleanly."""
    import yaml

    cfg = {
        "env": {
            "scenario_name": "uniform/simple_wood_and_stone",
            "n_agents": 2, "world_size": [8, 8], "episode_length": 6,
            "components": [
                {"Build": {}}, {"Gather": {}},
                {"PeriodicBracketTax": {"period": 4}},
            ],
        },
        "models": {"agents": "mlp", "planner": "mlp",
                   "agents_kwargs": {"hidden": 16}},
        "trainer": {"num_envs": 8, "rollout_len": 3, "epochs": 1,
                    "num_minibatches": 1, "train_planner": True},
        "general": {"seed": 0, "num_iterations": 3, "log_every": 1,
                    "save_every": 2},
    }
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))

    p = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "launch_distributed.py"),
         str(run_dir), "--nproc", "2", "--devices-per-proc", "2"],
        capture_output=True, timeout=500, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    hist = (run_dir / "history.jsonl").read_text().strip().splitlines()
    assert len(hist) == 3
    rec = json.loads(hist[-1])
    assert np.isfinite(rec["reward_a_mean"])
    assert (run_dir / "agent_params_iter3.msgpack").exists()
    # The saved params warm-start a single-process run (format round-trip).
    from flax import serialization

    import ai_economist_tpu as aet
    from ai_economist_tpu.training.ppo import PPOConfig
    from ai_economist_tpu.training.trainer import TwoLevelTrainer

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[("Build", {}), ("Gather", {}),
                    ("PeriodicBracketTax", {"period": 4})],
        n_agents=2, world_size=[8, 8], episode_length=6)
    trainer = TwoLevelTrainer(env, num_envs=4,
                              cfg=PPOConfig(rollout_len=3, epochs=1),
                              model="mlp", model_kwargs=dict(hidden=16))
    ts = trainer.init(jax.random.PRNGKey(0))
    blob = (run_dir / "agent_params_iter3.msgpack").read_bytes()
    restored = serialization.from_bytes(ts.params_a, blob)
    assert jax.tree.structure(restored) == jax.tree.structure(ts.params_a)


def test_windows_op_partitions_over_env_axis():
    """The egocentric-windows op's custom_partitioning must shard over the
    env axis under jit + NamedSharding and produce the same values as the
    unsharded lowering (the GSPMD path parallel/distributed.py compiles)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ai_economist_tpu.ops.windows import make_windows_op

    H = Wd = 11
    w = 2
    N, M, E = 3, 5, 16
    op = make_windows_op(N, w, H, Wd, byte_ok=True)
    rng = np.random.RandomState(9)
    maps = jnp.asarray(
        rng.randint(0, 5, size=(E, M, H + 2 * w, Wd + 2 * w)).astype(np.float32))
    loc = jnp.asarray(rng.randint(0, [H, Wd], size=(E, N, 2)).astype(np.int32))

    plain = jax.jit(jax.vmap(op))(maps, loc)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("host", "env"))
    sh = NamedSharding(mesh, P(("host", "env")))
    maps_s = jax.device_put(maps, sh)
    loc_s = jax.device_put(loc, sh)
    sharded = jax.jit(jax.vmap(op), out_shardings=sh)(maps_s, loc_s)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_saez_external_refresh_under_sharded_batch():
    """The hoisted saez rates refresh (scalar lax.cond at batch level) must
    compile and agree under jit with the env axis sharded over a (host, env)
    mesh — the GSPMD path the distributed trainer uses."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import ai_economist_tpu as aet
    from ai_economist_tpu.adapters.batched import auto_reset_step

    E = 8
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {}),
            ("Gather", {}),
            ("PeriodicBracketTax", dict(
                tax_model="saez", period=3, saez_buffer_size=8,
                saez_rates_external=True)),
        ],
        n_agents=4, world_size=[11, 11], episode_length=30,
    )
    keys = jax.random.split(jax.random.PRNGKey(2), E)
    states, obs = jax.jit(jax.vmap(env.reset_fresh))(keys)
    acts = {"a": np.zeros((E, 4), np.int32)}

    def run(states, n=7):
        for _ in range(n):
            states, obs, rew, done, _ = jax.jit(
                lambda s, a: auto_reset_step(env, s, a, None, "none")
            )(states, acts)
        return states

    plain = run(states)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("host", "env"))
    sh = NamedSharding(mesh, P(("host", "env")))
    states_s = jax.tree.map(
        lambda x: jax.device_put(x, sh) if getattr(x, "ndim", 0) else x, states)
    sharded = run(states_s)

    for (pa, a), (_pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(plain)[0],
        jax.tree_util.tree_flatten_with_path(sharded)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"state leaf {jax.tree_util.keystr(pa)}")


@pytest.mark.slow
def test_launch_distributed_saez_sync_runs(tmp_path):
    """The launcher's per-iteration Saez global-buffer sync (the ADVICE r3
    fix: tools/launch_distributed.py mirrors run.py's
    maybe_sync_saez_buffer) must execute under the real 2-process GSPMD
    mesh — the all-gather over sharded env states compiles and the job
    completes with finite metrics."""
    import yaml

    cfg = {
        "env": {
            "scenario_name": "uniform/simple_wood_and_stone",
            "n_agents": 2, "world_size": [8, 8], "episode_length": 8,
            "components": [
                {"Build": {}}, {"Gather": {}},
                {"PeriodicBracketTax": {
                    "period": 2, "tax_model": "saez",
                    "saez_buffer_size": 8}},
            ],
        },
        "models": {"agents": "mlp", "planner": "mlp",
                   "agents_kwargs": {"hidden": 16}},
        "trainer": {"num_envs": 8, "rollout_len": 4, "epochs": 1,
                    "num_minibatches": 1, "train_planner": False},
        "general": {"seed": 0, "num_iterations": 3, "log_every": 1,
                    "save_every": 0, "sync_saez_buffer": True},
    }
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))

    p = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "launch_distributed.py"),
         str(run_dir), "--nproc", "2", "--devices-per-proc", "2"],
        capture_output=True, timeout=500, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    hist = (run_dir / "history.jsonl").read_text().strip().splitlines()
    assert len(hist) == 3
    rec = json.loads(hist[-1])
    assert np.isfinite(rec["reward_a_mean"])
