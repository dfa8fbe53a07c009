"""Worker process for the multi-host distributed test / scaling harness.

Each worker joins a jax.distributed runtime (CPU backend, Gloo collectives,
N virtual devices per process), builds the global (host, env) mesh, runs the
real two-level PPO train step as one SPMD program, and writes its view of the
results to JSON. tests/test_distributed.py launches P of these and asserts
the results agree with a single-process P*N-device run — validating that the
multi-host path computes the SAME global program the single-host path does
(the property the reference gets by construction from Ray's central learner,
reference tutorials/rllib/training_script.py:266-336).

Usage: python distributed_worker.py <pid> <nproc> <port> <devices_per_proc>
       <out_json> [num_iterations] [num_envs] [time_steps(0|1)]
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    pid, nproc, port, devs = (int(x) for x in sys.argv[1:5])
    out_json = sys.argv[5]
    num_iterations = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    num_envs = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    time_steps = bool(int(sys.argv[8])) if len(sys.argv) > 8 else False

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs}"
    )
    if nproc > 1:
        from ai_economist_tpu.parallel import distributed as dist

        dist.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    from ai_economist_tpu.parallel import distributed as dist

    assert len(jax.devices()) == nproc * devs
    result = run_train_steps(
        num_iterations=num_iterations, num_envs=num_envs, time_steps=time_steps
    )
    result["process_id"] = pid
    result["num_processes"] = nproc
    result["global_devices"] = len(jax.devices())
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[worker {pid}] OK -> {out_json}", flush=True)


def run_train_steps(num_iterations=2, num_envs=8, time_steps=False):
    """The shared program: tiny flagship env, 2 PPO train iterations on the
    global mesh. Returns param checksums + metrics (identical across hosts)."""
    import time

    import numpy as np

    import ai_economist_tpu as aet
    from ai_economist_tpu.parallel import distributed as dist
    from ai_economist_tpu.training.ppo import PPOConfig
    from ai_economist_tpu.training.trainer import TwoLevelTrainer

    env = aet.make_env_instance(
        "uniform/simple_wood_and_stone",
        components=[
            ("Build", {}),
            ("Gather", {}),
            ("PeriodicBracketTax", {"period": 4}),
        ],
        n_agents=2,
        world_size=[8, 8],
        episode_length=6,
    )
    trainer = TwoLevelTrainer(
        env,
        num_envs=num_envs,
        cfg=PPOConfig(rollout_len=3, epochs=1, num_minibatches=1),
        model="mlp",
        model_kwargs=dict(hidden=16),
    )
    mesh = dist.make_global_mesh("env")
    ts = dist.init_trainer_distributed(trainer, jax.random.PRNGKey(7), mesh)
    all_metrics = []
    t0 = None
    for it in range(num_iterations):
        if time_steps and it == 1:
            jax.block_until_ready(ts.params_a)
            t0 = time.perf_counter()
        ts, metrics = trainer.train_iteration(ts, 0.025, 0.1)
    jax.block_until_ready(ts.params_a)
    dt = (time.perf_counter() - t0) if t0 is not None else None
    metrics = dist.fetch(metrics)
    all_metrics.append({k: float(v) for k, v in metrics.items()})

    params_a = dist.fetch(ts.params_a)
    params_p = dist.fetch(ts.params_p)

    def checksum(tree):
        leaves = jax.tree.leaves(tree)
        return float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))

    out = {
        "params_a_checksum": checksum(params_a),
        "params_p_checksum": checksum(params_p),
        "final_metrics": all_metrics[-1],
    }
    if dt is not None:
        out["train_iterations_per_s"] = (num_iterations - 1) / dt
    return out


if __name__ == "__main__":
    main()
