"""BatchedEnv: vmapped env replicas with WarpDrive-style auto-reset.

Plays the role of the reference FoundationEnvWrapper's GPU path
(ai_economist/foundation/env_wrapper.py:199-377): thousands of env replicas
stepping in lockstep on device, resetting themselves by re-applying a saved
post-reset state checkpoint when done (the `save_copy_and_apply_at_reset`
semantics of env_wrapper.py:291-338). Optionally shards the env axis over a
device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ai_economist_tpu.core.env import TpuEnv
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.parallel.mesh import shard_batch


class BatchedEnv:
    """num_envs lockstep replicas of a TpuEnv.

    reset(key) -> (states, obs); step(states, actions) -> (states, obs, rew,
    done, info). All arrays carry a leading [num_envs] axis. If auto_reset,
    done replicas are rewound to their saved post-reset state with a fresh
    RNG key (resample-free, like WarpDrive); call `reset` to re-randomize.
    """

    def __init__(
        self,
        env: TpuEnv,
        num_envs: int,
        auto_reset: bool = True,
        mesh=None,
    ):
        self.env = env
        self.num_envs = int(num_envs)
        self.auto_reset = bool(auto_reset)
        self.mesh = mesh
        self._initial_states: Optional[EnvState] = None

        self._reset_b = jax.jit(jax.vmap(env.reset_fresh))
        self._step_b = jax.jit(self._step_impl)

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        if self.mesh is not None:
            keys = shard_batch(keys, self.mesh)
        states, obs = self._reset_b(keys)
        self._initial_states = states
        return states, obs

    def _step_impl(self, states, actions, initial_states):
        step = jax.vmap(self.env.step)
        nstates, obs, rew, done, info = step(states, actions)
        if self.auto_reset:
            def pick(init, cur):
                d = done.reshape(done.shape + (1,) * (cur.ndim - 1))
                return jnp.where(d, init, cur)

            reset_states = jax.tree.map(pick, initial_states, nstates)
            # Preserve RNG stream + episode counters through the rewind.
            reset_states = reset_states.replace(
                key=nstates.key, completions=nstates.completions
            )
            nstates = reset_states
            # Done replicas' obs must describe the rewound (fresh) state so
            # the policy's next action is valid; only pay for the recompute
            # on steps where something actually finished.
            obs = jax.lax.cond(
                done.any(),
                lambda s: jax.vmap(self.env.observations)(s),
                lambda s: obs,
                nstates,
            )
        return nstates, obs, rew, done, info

    def step(self, states, actions: Dict[str, jnp.ndarray]):
        assert self._initial_states is not None, "call reset() first"
        return self._step_b(states, actions, self._initial_states)
