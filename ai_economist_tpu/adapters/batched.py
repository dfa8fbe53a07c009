"""BatchedEnv: vmapped env replicas with in-graph auto-reset.

Plays the role of the reference FoundationEnvWrapper's GPU path
(ai_economist/foundation/env_wrapper.py:199-377): thousands of env replicas
stepping in lockstep on device. Two auto-reset flavors:

  * "rewind" — re-apply a saved post-reset state checkpoint when done (the
    WarpDrive `save_copy_and_apply_at_reset` semantics of
    env_wrapper.py:291-338). Every episode of a replica replays the same
    layout/skills.
  * "fresh" — run a full re-randomized `reset_fresh` in-graph on episode
    boundaries (the RLlib-path semantics the paper curricula use: a new
    `reset()` per episode, tutorials/rllib/env_wrapper.py:207-211). This is
    the right mode for training; the reset is only computed on steps where
    some replica actually finished (`lax.cond` on `done.any()`).

Optionally shards the env axis over a device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.env import TpuEnv
from ai_economist_tpu.core.state import EnvState
from ai_economist_tpu.parallel.mesh import shard_batch


def _merge_where_done(done, fresh, current):
    """Per-leaf select: done replicas take `fresh`, others keep `current`."""

    def pick(f, c):
        d = done.reshape(done.shape + (1,) * (c.ndim - 1))
        return jnp.where(d, f, c)

    return jax.tree.map(pick, fresh, current)


def auto_reset_step(
    env: TpuEnv,
    states: EnvState,
    actions: Dict[str, jnp.ndarray],
    initial_states: Optional[EnvState] = None,
    reset_mode: str = "fresh",
):
    """vmapped env.step + in-graph auto-reset of done replicas.

    Shared by BatchedEnv and the trainers. `reset_mode`:
      * "fresh"  — re-randomized reset_fresh per done replica (reference
        RLlib-path behavior, tutorials/rllib/env_wrapper.py:207-211).
      * "rewind" — rewind to `initial_states` (WarpDrive behavior,
        env_wrapper.py:291-338); requires `initial_states`.
      * "none"   — no auto-reset.
    Returns (states, obs, rew, done, info); obs for done replicas describes
    the post-reset state so the policy's next action is valid.
    """
    # Hoisted saez day-1 rates refresh (identity for non-saez envs): a real
    # scalar branch at batch level, where in-step it would be a both-branch
    # select under vmap paid every step (core/env.py maybe_saez_refresh).
    states = env.maybe_saez_refresh(states)
    step = jax.vmap(env.step)
    nstates, obs, rew, done, info = step(states, actions)
    if reset_mode == "none":
        return nstates, obs, rew, done, info

    if reset_mode == "rewind":
        if initial_states is None:
            raise ValueError("reset_mode='rewind' requires initial_states")

        reset_states = _merge_where_done(done, initial_states, nstates)
        # Preserve RNG stream + episode counters through the rewind.
        reset_states = reset_states.replace(
            key=nstates.key, completions=nstates.completions
        )
        obs = jax.lax.cond(
            done.any(),
            lambda s: jax.vmap(env.observations)(s),
            lambda s: obs,
            reset_states,
        )
        return reset_states, obs, rew, done, info

    if reset_mode != "fresh":
        raise ValueError(f"unknown reset_mode {reset_mode!r}")

    def do_fresh(nstates, obs):
        # A reset key disjoint from the step stream: fold a constant into the
        # post-step per-env key.
        rkeys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(nstates.key)
        fresh_states, fresh_obs = jax.vmap(env.reset_fresh)(rkeys)
        merged = _merge_where_done(done, fresh_states, nstates)
        # Episode counters are cumulative across resets.
        merged = merged.replace(completions=nstates.completions)
        return merged, _merge_where_done(done, fresh_obs, obs)

    nstates, obs = jax.lax.cond(
        done.any(), do_fresh, lambda s, o: (s, o), nstates, obs
    )
    return nstates, obs, rew, done, info


class BatchedEnv:
    """num_envs lockstep replicas of a TpuEnv.

    reset(key) -> (states, obs); step(states, actions) -> (states, obs, rew,
    done, info). All arrays carry a leading [num_envs] axis. `auto_reset`
    picks the reset flavor: True/"rewind" = WarpDrive checkpoint rewind,
    "fresh" = re-randomized in-graph reset, False/"none" = no auto-reset.
    """

    def __init__(
        self,
        env: TpuEnv,
        num_envs: int,
        auto_reset=True,
        mesh=None,
    ):
        self.env = env
        self.num_envs = int(num_envs)
        if auto_reset is True:
            self.reset_mode = "rewind"
        elif auto_reset is False:
            self.reset_mode = "none"
        else:
            self.reset_mode = str(auto_reset)
        self.auto_reset = self.reset_mode != "none"
        self.mesh = mesh
        self._initial_states: Optional[EnvState] = None

        self._reset_b = jax.jit(jax.vmap(env.reset_fresh))
        self._step_b = jax.jit(self._step_impl)
        self._replay: Optional[Dict[str, Any]] = None

    def reset(self, key, record: bool = False):
        """Reset all replicas from `key`. With record=True, begin recording a
        replay log: the trajectory is fully determined by (key, actions), so
        the log is just the reset key plus the per-step action stream (the
        reference stores per-step RNG seed states for the same guarantee,
        base_env.py:454-471; here the whole sim runs on counter-based
        threefry keys carried in the state, so the reset key suffices)."""
        if record:
            self._replay = {"reset_key": _key_data(key), "actions": []}
        else:
            self._replay = None
        keys = jax.random.split(key, self.num_envs)
        if self.mesh is not None:
            keys = shard_batch(keys, self.mesh)
        states, obs = self._reset_b(keys)
        self._initial_states = states
        return states, obs

    def _step_impl(self, states, actions, initial_states):
        return auto_reset_step(
            self.env, states, actions, initial_states, self.reset_mode
        )

    def step(self, states, actions: Dict[str, jnp.ndarray]):
        assert self._initial_states is not None, "call reset() first"
        if self._replay is not None:
            self._replay["actions"].append(
                {k: np.asarray(v) for k, v in actions.items()}
            )
        return self._step_b(states, actions, self._initial_states)

    # ------------------------------------------------------------------
    # episode replay (reference base_env.py:454-471 `_replay` analog)
    # ------------------------------------------------------------------
    def save_replay(self, path: str) -> str:
        """Save the replay log recorded since `reset(key, record=True)` as
        lz4 JSON. `playback(load_episode_log(path))` on an identically
        configured BatchedEnv re-creates the trajectory bit-identically,
        including through auto-reset boundaries."""
        from ai_economist_tpu.utils.logs import save_episode_log

        if self._replay is None:
            raise ValueError("no replay recorded; call reset(key, record=True)")
        log = {
            "format": "ai_economist_tpu/replay-v1",
            "num_envs": self.num_envs,
            "reset_mode": self.reset_mode,
            "n_agents": self.env.n_agents,
            "reset_key": self._replay["reset_key"].tolist(),
            "actions": [
                {k: v.tolist() for k, v in step.items()}
                for step in self._replay["actions"]
            ],
        }
        return save_episode_log(log, path)

    def playback(self, log):
        """Re-run a recorded trajectory; yields (states, obs, rew, done, info)
        per recorded step. `log` is a dict from `load_episode_log` (or a path
        to one). The env build, num_envs, and reset flavor must match the
        recording — the trajectory is then bit-identical to the live run."""
        if isinstance(log, str):
            from ai_economist_tpu.utils.logs import load_episode_log

            log = load_episode_log(log)
        if log.get("format") != "ai_economist_tpu/replay-v1":
            raise ValueError(f"not a replay log: format={log.get('format')!r}")
        for field, mine in (("num_envs", self.num_envs),
                            ("reset_mode", self.reset_mode),
                            ("n_agents", self.env.n_agents)):
            if log[field] != mine:
                raise ValueError(
                    f"replay {field}={log[field]} but this BatchedEnv has "
                    f"{field}={mine}; playback requires the recording's "
                    f"configuration"
                )
        key = _key_from_data(np.asarray(log["reset_key"], dtype=np.uint32))
        states, obs = self.reset(key)
        for step in log["actions"]:
            actions = {
                k: jnp.asarray(np.asarray(v, dtype=np.int32))
                for k, v in step.items()
            }
            states, obs, rew, done, info = self.step(states, actions)
            yield states, obs, rew, done, info


def _key_data(key) -> np.ndarray:
    """Raw uint32 words of a PRNG key (typed or raw)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(key))
    return np.asarray(key)


def _key_from_data(data: np.ndarray):
    return jnp.asarray(data, dtype=jnp.uint32)
