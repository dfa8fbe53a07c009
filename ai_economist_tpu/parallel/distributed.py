"""Multi-host execution: jax.distributed entry + DCN x ICI mesh + global batches.

This is the TPU-native replacement for the reference's multi-process rollout
fan-out — Ray actor workers with object-store RPC
(reference tutorials/rllib/utils/remote.py:11-73, 15 worker processes in
tutorials/rllib/training_script.py:266-336, phase1/config.yaml num_workers).
Instead of N Python processes each stepping private env copies and shipping
results over RPC, every host runs the SAME jitted SPMD program over a global
2-D ("host", "env") mesh:

  * the "env" axis lays replicas across the chips of one host/slice, so the
    per-iteration collectives (Saez buffer all-gather, metric psums, gradient
    reductions implied by replicated params) ride ICI;
  * the "host" axis spans processes/slices, so only the cross-host portion of
    those reductions crosses DCN — XLA inserts the hierarchical collective.

Design per the scaling-book recipe: pick a mesh, annotate shardings on the
leading env axis, let XLA place the collectives. No hand-written RPC.

Single-process (1 host, N chips) is the degenerate host-axis=1 case and runs
the exact same code path, which is what keeps the multi-host path testable on
one machine: spawn P processes x D virtual CPU devices
(`--xla_force_host_platform_device_count=D`) with `initialize()`, and the
global program must produce bit-identical results to the 1-process P*D-device
run (tests/test_distributed.py asserts this).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HOST_AXIS = "host"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) a multi-process JAX runtime.

    Arguments may come from the environment (AET_COORDINATOR / AET_NUM_PROCS /
    AET_PROC_ID), mirroring how launchers pass Ray addresses to the
    reference's training_script. On TPU pods the three arguments are optional
    — jax.distributed autodetects from the TPU metadata server. No-op when
    already initialized or when nothing indicates a multi-process launch.
    """
    if jax.distributed.is_initialized():
        return

    coordinator_address = coordinator_address or os.environ.get("AET_COORDINATOR")
    if num_processes is None and "AET_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["AET_NUM_PROCS"])
    if process_id is None and "AET_PROC_ID" in os.environ:
        process_id = int(os.environ["AET_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        # Single-process run (or TPU pod with autodetection disabled): leave
        # the runtime alone.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(
    axis_name: str = "env",
    devices: Optional[Sequence] = None,
    model_axis: int = 1,
) -> Mesh:
    """("host", axis_name[, "model"]) mesh over ALL processes' devices.

    Rows are hosts (process-contiguous device groups, so the env axis of each
    row is intra-host/ICI); the host axis is the DCN axis. Single-process
    builds get a host axis of size 1 — same program, no special case.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_hosts = max(jax.process_count(), 1)
    if n < len(jax.devices()):
        n_hosts = 1  # explicit device subset (tests): treat as one host
    assert n % n_hosts == 0, (n, n_hosts)
    per_host = n // n_hosts
    # jax.devices() is ordered by process_index then local device order, so a
    # [n_hosts, per_host] reshape puts each process's devices in one row.
    arr = np.array(devices).reshape(n_hosts, per_host)
    if model_axis > 1:
        assert per_host % model_axis == 0
        arr = arr.reshape(n_hosts, per_host // model_axis, model_axis)
        return Mesh(arr, (HOST_AXIS, axis_name, "model"))
    return Mesh(arr, (HOST_AXIS, axis_name))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Leading-axis sharding over host x env (the full data-parallel extent)."""
    if HOST_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((HOST_AXIS, axis_name)))
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_dp_devices(mesh: Mesh, axis_name: str = "env") -> int:
    n = mesh.shape[axis_name]
    if HOST_AXIS in mesh.axis_names:
        n *= mesh.shape[HOST_AXIS]
    return n


def process_env_slice(num_envs: int) -> slice:
    """This process's contiguous slice of the global env batch.

    With the mesh rows process-contiguous (make_global_mesh), the leading-axis
    shards owned by this process are exactly one contiguous block.
    """
    n_proc = max(jax.process_count(), 1)
    assert num_envs % n_proc == 0, (num_envs, n_proc)
    per = num_envs // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def global_env_batch(local_tree, mesh: Mesh, axis_name: str = "env"):
    """Assemble a global leading-axis-sharded pytree from process-local data.

    Each process passes its `process_env_slice` of the batch; the result is a
    global jax.Array usable directly inside jit. Replaces the reference's
    host->device DataFeed push (reference env_wrapper.py:287-332) and Ray
    object-store scatter.
    """
    sh = env_sharding(mesh, axis_name)
    if max(jax.process_count(), 1) == 1:
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), local_tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_tree,
    )


def replicate(tree, mesh: Mesh):
    """Place host-identical values (params, opt state) replicated on the mesh.

    Callers must pass the same values on every process (e.g. computed from the
    same PRNG key) — this is the jax.distributed analog of Ray broadcasting
    policy weights to workers.
    """
    sh = replicated(mesh)
    if max(jax.process_count(), 1) == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, tree)


def fetch(tree):
    """Global arrays -> host numpy (fully-replicated or fully-addressable).

    For replicated outputs every process holds the value; for env-sharded
    outputs use `fetch_local` instead.
    """
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(get, tree)


def fetch_local(tree):
    """This process's shard of env-sharded global arrays, as host numpy."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = sorted(x.addressable_shards, key=lambda s: s.index)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(x)

    return jax.tree.map(get, tree)


# ---------------------------------------------------------------------------
# Distributed trainer driver
# ---------------------------------------------------------------------------


def init_trainer_distributed(trainer, key, mesh: Mesh):
    """TwoLevelTrainer.init over a (host, env) mesh, multi-process safe.

    Every process computes params from the same key (identical by PRNG
    determinism) and resets only ITS slice of the env batch; the pieces are
    assembled into global arrays. Returns a TrainerState of global arrays
    ready for trainer.train_iteration (whose jit runs as one SPMD program
    across all hosts).
    """
    import jax.numpy as jnp

    env = trainer.env
    num_envs = trainer.num_envs
    k_env, k_a, k_p, k_state = jax.random.split(key, 4)

    # --- env states: reset only the local slice (computed on local devices).
    sl = process_env_slice(num_envs)
    env_keys = jax.random.split(k_env, num_envs)[sl]
    with jax.default_device(jax.local_devices()[0]):
        local_states, local_obs = jax.jit(jax.vmap(env.reset_fresh))(env_keys)
    env_states = global_env_batch(fetch_local(local_states), mesh)
    obs = global_env_batch(fetch_local(local_obs), mesh)
    trainer._initial_states = env_states

    # --- params/opt/carries: host-identical, replicated.
    from ai_economist_tpu.training.trainer import (
        A_OBS_KEYS, P_OBS_KEYS, TrainerState, _fold2, _select,
    )

    n = trainer.n_agents
    obs_a1 = jax.tree.map(
        lambda x: np.asarray(x)[:1], _fold2(_select(fetch_local(local_obs)["a"], A_OBS_KEYS))
    )
    carry_a1 = trainer.model_a.initial_carry(1)
    params_a = trainer.model_a.init(k_a, obs_a1, carry_a1)
    obs_p1 = jax.tree.map(
        lambda x: np.asarray(x)[:1], _select(fetch_local(local_obs)["p"], P_OBS_KEYS)
    )
    carry_p1 = trainer.model_p.initial_carry(1)
    params_p = trainer.model_p.init(k_p, obs_p1, carry_p1)

    params_a = replicate(params_a, mesh)
    params_p = replicate(params_p, mesh)
    opt_a = replicate(trainer.tx.init(fetch(params_a)), mesh)
    opt_p = replicate(trainer.tx.init(fetch(params_p)), mesh)

    carry_a = global_env_batch(
        fetch(trainer.model_a.initial_carry(num_envs * n // max(jax.process_count(), 1))),
        mesh,
    )
    carry_p = global_env_batch(
        fetch(trainer.model_p.initial_carry(num_envs // max(jax.process_count(), 1))),
        mesh,
    )

    return TrainerState(
        params_a=params_a,
        opt_a=opt_a,
        params_p=params_p,
        opt_p=opt_p,
        env_states=env_states,
        obs=obs,
        carry_a=carry_a,
        carry_p=carry_p,
        key=jax.device_put(k_state, replicated(mesh)),
        iteration=jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
    )
