"""Cross-backend consistency checker.

TPU-native analog of the reference's `EnvironmentCPUvsGPU` harness
(tests/run_covid19_cpu_gpu_consistency_checks.py:37-101), which runs the same
env on the CPU object engine and on the CUDA kernels and compares
trajectories. In a pure-JAX framework the corresponding failure modes are
compilation and partitioning, so the checker compares, for the same seed and
the same action stream:

  1. eager (un-jitted) execution vs `jax.jit`-compiled execution, and
  2. single-device execution vs execution sharded over the env axis of a
     device mesh (ICI-collective path).

Any divergence beyond float tolerance indicates a jit/sharding bug in a
component or scenario kernel.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.env import TpuEnv


def _random_action_stream(env: TpuEnv, num_envs: int, steps: int, key):
    """Fixed pre-sampled action stream shared by all execution modes."""
    n_a = env.agent_action_space.total_actions
    ka, kp = jax.random.split(key)
    acts = {
        "a": jax.random.randint(
            ka, (steps, num_envs, env.n_agents), 0, n_a, jnp.int32
        )
    }
    p = env.planner_action_space
    if p.n_subspaces > 0:
        dims = jnp.asarray(p.action_dims, jnp.int32)
        u = jax.random.uniform(kp, (steps, num_envs, p.n_subspaces))
        acts["p"] = (u * dims[None, None, :]).astype(jnp.int32)
    return acts


def _rollout(env: TpuEnv, num_envs: int, actions, key, jit: bool, sharding=None):
    reset_b = jax.vmap(env.reset_fresh)
    step_b = jax.vmap(env.step)
    if jit:
        reset_b = jax.jit(reset_b)
        step_b = jax.jit(step_b)

    states, obs = reset_b(jax.random.split(key, num_envs))
    if sharding is not None:
        states = jax.device_put(states, sharding)

    traj = []
    T = actions["a"].shape[0]
    for t in range(T):
        act_t = {k: v[t] for k, v in actions.items()}
        states, obs, rew, done, _ = step_b(states, act_t)
        traj.append(
            dict(
                inventory=states.inventory,
                escrow=states.escrow,
                loc=states.loc,
                rew_a=rew["a"],
                rew_p=rew["p"],
            )
        )
    return jax.tree.map(np.asarray, traj)


def run_consistency_check(
    env: TpuEnv,
    num_envs: int = 4,
    steps: int = 32,
    seed: int = 0,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    mesh: Optional[jax.sharding.Mesh] = None,
    verbose: bool = False,
) -> Dict[str, float]:
    """Run the same seeded trajectory eager / jitted / (optionally) sharded
    and assert element-wise agreement. Returns max abs deviations per mode."""
    key = jax.random.PRNGKey(seed)
    k_act, k_env = jax.random.split(key)
    actions = _random_action_stream(env, num_envs, steps, k_act)

    ref = _rollout(env, num_envs, actions, k_env, jit=False)
    out = {}

    modes = {"jit": dict(jit=True, sharding=None)}
    if mesh is not None:
        from ai_economist_tpu.parallel.mesh import env_sharding

        modes["sharded"] = dict(jit=True, sharding=env_sharding(mesh))

    for mode, kw in modes.items():
        got = _rollout(env, num_envs, actions, k_env, **kw)
        max_dev = 0.0
        for t, (r, g) in enumerate(zip(ref, got)):
            for field in r:
                dev = np.max(np.abs(r[field].astype(np.float64) - g[field].astype(np.float64)))
                max_dev = max(max_dev, float(dev))
                if not np.allclose(r[field], g[field], atol=atol, rtol=rtol):
                    raise AssertionError(
                        f"[{mode}] divergence at step {t}, field '{field}': "
                        f"max|Δ|={dev:.3e} (atol={atol}, rtol={rtol})"
                    )
        out[mode] = max_dev
        if verbose:
            print(f"consistency[{mode}]: OK, max|Δ|={max_dev:.3e} over {steps} steps")
    return out
