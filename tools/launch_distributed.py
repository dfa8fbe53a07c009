"""Multi-process distributed training launcher.

The user-facing entry for the multi-host layer (parallel/distributed.py) —
the role Ray's actor fan-out plays for the reference's training_script
(tutorials/rllib/training_script.py:266-336, utils/remote.py:11-73), done
the TPU way: every process runs the SAME jitted SPMD train step over a
global (host, env) mesh, and XLA's collectives replace RPC.

Single machine (CPU emulation or one TPU host):
  python tools/launch_distributed.py <run_dir> --nproc 2 --devices-per-proc 4

Real multi-host TPU pods: run one worker per host yourself (or via your
cluster launcher) with the env vars the worker consumes —
  AET_COORDINATOR=host0:1234 AET_NUM_PROCS=4 AET_PROC_ID=<i> \
      python tools/launch_distributed.py <run_dir> --worker
(on TPU pods with metadata autodetection the three vars are optional).

<run_dir> holds a config.yaml in the training/run.py format; trainer.num_envs
is the GLOBAL env count and must divide by the process count. Process 0
writes history.jsonl + checkpoints into the run dir.
"""

import argparse
import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(run_dir: str):
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CPU-emulation mode: beat any ambient platform plugin even if jax
        # was already imported by site hooks (config wins over the env var).
        jax.config.update("jax_platforms", "cpu")

    from ai_economist_tpu.parallel import distributed as dist

    dist.initialize()  # AET_* env vars / TPU-pod autodetection / no-op
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )

    from ai_economist_tpu.training import run as R

    cfg = R.load_config(run_dir)
    general = cfg.get("general", {})
    trainer = R.build_trainer(cfg)
    mesh = dist.make_global_mesh("env")
    is_chief = jax.process_index() == 0
    if is_chief:
        print(f"[chief] {jax.process_count()} processes, "
              f"{len(jax.devices())} global devices, mesh {dict(mesh.shape)}",
              flush=True)

    ent_a = R.piecewise(cfg.get("trainer", {}).get("entropy_schedule_agents"),
                        trainer.cfg.entropy_coef)
    ent_p = R.piecewise(cfg.get("trainer", {}).get("entropy_schedule_planner"),
                        trainer.cfg.entropy_coef)

    ts = dist.init_trainer_distributed(
        trainer, jax.random.PRNGKey(int(general.get("seed", 0))), mesh
    )
    num_iters = int(general.get("num_iterations", 100))
    log_every = max(1, int(general.get("log_every", 10)))
    save_every = int(general.get("save_every", 0))
    saez_sync = bool(general.get("sync_saez_buffer", True))
    history = os.path.join(os.path.abspath(run_dir), "history.jsonl")
    if is_chief:
        # Fresh run (no resume path here): truncate any stale history so a
        # relaunched job doesn't append duplicate iteration records.
        open(history, "w").close()

    def save(it):
        # Params are replicated (host-identical), so the chief saves them
        # alone — as a flax msgpack blob, NOT via orbax, whose multi-process
        # mode expects every process to join the save barrier.
        from flax import serialization

        path = os.path.join(os.path.abspath(run_dir),
                            f"agent_params_iter{it}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(dist.fetch(ts.params_a)))

    for it in range(num_iters):
        ts, metrics = trainer.train_iteration(ts, ent_a(it), ent_p(it))
        if saez_sync:
            # Same global-buffer semantics as the single-process runner
            # (run.py): under jit with sharded states the all-gather lowers
            # to cross-host collectives, matching the reference's shared
            # Ray buffer (tutorials/rllib/utils/remote.py:56-73).
            ts = R.maybe_sync_saez_buffer(trainer, ts)
        if it % log_every == 0:
            m = {k: float(v) for k, v in dist.fetch(metrics).items()}
            if is_chief:
                print(f"iter {it}: " +
                      " ".join(f"{k}={v:.4g}" for k, v in sorted(m.items())),
                      flush=True)
                with open(history, "a") as f:
                    f.write(json.dumps({"iteration": it, **m}) + "\n")
        if is_chief and save_every and it and it % save_every == 0:
            save(it)
    if is_chief and save_every:
        save(num_iters)
    # Sync all hosts before teardown, then leave the runtime cleanly (an
    # abrupt exit can hang the coordinator's heartbeat watchers).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("launch_distributed:done")
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--worker", action="store_true",
                    help="run as one worker (env vars select the process)")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=0,
                    help="force N virtual CPU devices per process (testing); "
                         "0 = use real local devices")
    args = ap.parse_args()

    if args.worker:
        if args.devices_per_proc:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
            )
            os.environ["JAX_PLATFORMS"] = "cpu"  # CPU emulation mode
        worker(args.run_dir)
        return

    port = _free_port()
    procs = []
    for pid in range(args.nproc):
        env = dict(
            os.environ,
            AET_COORDINATOR=f"localhost:{port}",
            AET_NUM_PROCS=str(args.nproc),
            AET_PROC_ID=str(pid),
        )
        cmd = [sys.executable, os.path.abspath(__file__), args.run_dir,
               "--worker"]
        if args.devices_per_proc:
            cmd += ["--devices-per-proc", str(args.devices_per_proc)]
        procs.append(subprocess.Popen(cmd, env=env, cwd=_REPO))
    rc = 0
    for p in procs:
        p.wait()
        rc = rc or p.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
