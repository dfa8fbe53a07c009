"""Scaling-efficiency harness -> SCALING_rNN.json (BASELINE.md "N-host
scaling efficiency at 1 chip, 1 host, and N>=2 hosts").

Measures weak scaling (fixed work per device) of:
  1. env-step throughput on the REAL bench config (gather-trade-build,
     4 agents, 25x25, CDA+tax — the BENCH_rNN workload) at 1/2/4/8 devices
     on the virtual CPU mesh, sharded with the same (host, env) mesh the
     multi-host path uses;
  2. the full two-level PPO train iteration at 1 and 8 devices, plus a
     2-process x 4-device point (jax.distributed + Gloo — a real process
     boundary, standing in for DCN).

Each point runs in a fresh subprocess so the XLA device count can differ.
Efficiency(N) = throughput(N) / (N * throughput(1)).

Usage:
  python tools/scaling.py                  # all points -> SCALING_r03.json
  python tools/scaling.py --envstep-worker <devices> <envs_per_dev> <steps>
"""

import json
import os
import socket
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "SCALING_r05.json")
ENVS_PER_DEV = 64
STEPS = 25
TRAIN_ENVS_PER_DEV = 4
TRAIN_ITERS = 5


def envstep_worker(devices: int, envs_per_dev: int, steps: int):
    """Measure env-steps/s on `devices` virtual CPU devices; print one JSON."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Single-threaded intra-op per virtual device: otherwise the 1-device
    # baseline quietly uses every host core and "efficiency" at N devices
    # compares against an N-core baseline.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
        + " --xla_cpu_multi_thread_eigen=false"
    )

    import jax.numpy as jnp

    import ai_economist_tpu as aet
    from ai_economist_tpu.adapters.batched import BatchedEnv
    from ai_economist_tpu.parallel import distributed as dist

    # The BENCH workload (bench.py COMPONENTS/ENV_COMMON).
    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {"skill_dist": "pareto", "payment_max_skill_multiplier": 3}),
            ("ContinuousDoubleAuction", {"max_num_orders": 5}),
            ("Gather", {"skill_dist": "pareto"}),
            ("PeriodicBracketTax", {"period": 100}),
        ],
        n_agents=4,
        world_size=[25, 25],
        episode_length=1000,
    )
    num_envs = devices * envs_per_dev
    batch = BatchedEnv(env, num_envs, auto_reset=True)
    mesh = dist.make_global_mesh("env")
    key = jax.random.PRNGKey(0)
    states, obs = batch.reset(key)
    sh = dist.env_sharding(mesh)
    states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
    obs = jax.tree.map(lambda x: jax.device_put(x, sh), obs)

    p_layout = env.planner_action_space

    def random_actions(key, obs):
        ka, kp = jax.random.split(key)
        logits = jnp.where(obs["a"]["action_mask"] > 0, 0.0, -jnp.inf)
        a = jax.random.categorical(ka, logits, axis=-1)
        acts = {"a": a}
        if p_layout.n_subspaces > 0:
            plogits = jnp.where(obs["p"]["action_mask"] > 0, 0.0, -jnp.inf)
            outs, off = [], 0
            for dim in p_layout.action_dims:
                outs.append(
                    jax.random.categorical(kp, plogits[..., off:off + dim], -1)
                )
                off += dim
            acts["p"] = jnp.stack(outs, axis=-1)
        return acts

    random_actions = jax.jit(random_actions)

    for _ in range(3):
        key, k = jax.random.split(key)
        states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
    jax.block_until_ready(states.t)

    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        states, obs, rew, done, _ = batch.step(states, random_actions(k, obs))
    jax.block_until_ready(states.t)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "devices": devices,
        "num_envs": num_envs,
        "env_steps_per_s": num_envs * steps / dt,
    }))


def _run_envstep_point(devices: int):
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--envstep-worker",
         str(devices), str(ENVS_PER_DEV), str(STEPS)],
        capture_output=True, timeout=900, cwd=_REPO,
    )
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    return json.loads(p.stdout.decode().strip().splitlines()[-1])


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_train_point(nproc: int, devs: int, envs_per_dev: int):
    """Train-iteration throughput on nproc processes x devs devices."""
    worker = os.path.join(_REPO, "tests", "distributed_worker.py")
    total_envs = nproc * devs * envs_per_dev
    port = _free_port() if nproc > 1 else 0
    outs = [f"/tmp/scaling_train_{nproc}x{devs}_{pid}.json"
            for pid in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port),
             str(devs), outs[pid], str(TRAIN_ITERS), str(total_envs), "1"],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, cwd=_REPO,
        )
        for pid in range(nproc)
    ]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode()[-3000:]
    r = json.load(open(outs[0]))
    return {
        "processes": nproc,
        "devices": nproc * devs,
        "num_envs": total_envs,
        "train_iterations_per_s": r["train_iterations_per_s"],
        "env_steps_per_s": r["train_iterations_per_s"] * total_envs * 3,  # rollout_len=3
        "params_a_checksum": r["params_a_checksum"],
    }


def _tpu_point():
    """Real-chip per-device throughput: run bench.py on the TPU and reuse its
    JSON line (the driver's BENCH workload — identical config)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let bench.py pick the real backend
    p = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, timeout=1200, cwd=_REPO, env=env,
    )
    if p.returncode != 0:
        return {"error": p.stderr.decode()[-500:]}
    line = json.loads(p.stdout.decode().strip().splitlines()[-1])
    return {
        "devices": 1,
        "env_steps_per_s": line["value"],
        "vs_reference_cpu_baseline": line["vs_baseline"],
        "metric": line["metric"],
    }


def main():
    cores = os.cpu_count() or 1
    results = {"meta": {
        "host_physical_cores": cores,
        "workload_envstep": "gather-trade-build 4ag 25x25 cda5 tax100 "
                            f"(bench.py config), {ENVS_PER_DEV} envs/device, "
                            "weak scaling on virtual CPU devices, "
                            "single-threaded intra-op per device",
        "workload_train": "two-level PPO train_iteration (mlp, rollout 3), "
                          f"{TRAIN_ENVS_PER_DEV} envs/device",
        "note": "CPU-device emulation validates the sharded SPMD program and "
                "measures its dispatch/collective overhead. With only "
                f"{cores} host cores, points with devices > cores are "
                "core-oversubscribed: the honest ideal there is "
                "min(1, cores/devices), reported as ideal_efficiency. "
                "tpu_single_chip is the real-hardware number. For projected "
                "multi-HOST efficiency over realistic DCN bandwidths see "
                "COLLECTIVES_r05.json (measured cross-host bytes/iteration "
                "divided against measured single-chip iteration time).",
    }}

    env_points = []
    for d in (1, 2, 4, 8):
        pt = _run_envstep_point(d)
        env_points.append(pt)
        print(f"envstep {d} devices: {pt['env_steps_per_s']:.0f} steps/s",
              file=sys.stderr, flush=True)
    base = env_points[0]["env_steps_per_s"]
    for pt in env_points:
        d = pt["devices"]
        pt["weak_scaling_efficiency"] = pt["env_steps_per_s"] / (d * base)
        pt["ideal_efficiency"] = min(1.0, cores / d)
        pt["efficiency_vs_core_limited_ideal"] = (
            pt["weak_scaling_efficiency"] / pt["ideal_efficiency"]
        )
        pt["core_oversubscribed"] = d > cores
    results["env_step_scaling"] = env_points

    train_points = []
    for nproc, devs in ((1, 1), (1, 8), (2, 4)):
        pt = _run_train_point(nproc, devs, TRAIN_ENVS_PER_DEV)
        train_points.append(pt)
        print(f"train {nproc}proc x {devs}dev: "
              f"{pt['env_steps_per_s']:.0f} env-steps/s",
              file=sys.stderr, flush=True)
    tbase = train_points[0]["env_steps_per_s"]
    for pt in train_points:
        d = pt["devices"]
        pt["weak_scaling_efficiency"] = pt["env_steps_per_s"] / (d * tbase)
        pt["ideal_efficiency"] = min(1.0, cores / d)
        pt["core_oversubscribed"] = d > cores
    # Cross-topology agreement: 1x8 and 2x4 run the same global program.
    results["train_step_scaling"] = train_points
    results["multiprocess_matches_singleprocess"] = bool(
        abs(train_points[1]["params_a_checksum"]
            - train_points[2]["params_a_checksum"])
        <= 1e-6 * abs(train_points[1]["params_a_checksum"])
    )
    results["cross_process_overhead_s_per_train_iteration"] = (
        1.0 / train_points[2]["train_iterations_per_s"]
        - 1.0 / train_points[1]["train_iterations_per_s"]
    )

    if "--no-tpu" in sys.argv:
        # CPU-only pass (e.g. while the chip is training); merge the TPU
        # point later with --tpu-only.
        results["tpu_single_chip"] = {"pending": True}
    else:
        results["tpu_single_chip"] = _tpu_point()

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--envstep-worker":
        envstep_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--tpu-only":
        # Fill the pending TPU point of an existing OUT (run once the chip
        # is idle so the bench is uncontended).
        results = json.load(open(OUT))
        results["tpu_single_chip"] = _tpu_point()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(json.dumps(results["tpu_single_chip"], indent=1))
    else:
        main()
