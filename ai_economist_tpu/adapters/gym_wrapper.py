"""GymStyleEnv: reference-compatible per-agent dict API over TpuEnv.

Gives users of the reference's BaseEnvironment interface
(ai_economist/foundation/base/base_env.py:852-1032: obs = env.reset();
obs, rew, done, info = env.step({agent_idx: action})) a drop-in surface on
top of the jitted engine. Observations and rewards come back as numpy, keyed
by "0".."N-1" and "p" exactly like the reference's non-collated mode, with
the planner's agent-wise sub-observations expanded to "p0".."pN-1" keys.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_economist_tpu.core.env import TpuEnv


class GymStyleEnv:
    def __init__(self, env: TpuEnv, seed: int = 0):
        self.env = env
        self.n_agents = env.n_agents
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._reset_fn = jax.jit(env.reset)
        self._init_fn = jax.jit(env.init_state)
        self._step_fn = jax.jit(env.step)
        self._spaces = None

    # ------------------------------------------------------------------
    # gym space synthesis (reference env_wrapper.py:139-171,
    # tutorials/rllib/env_wrapper.py:74-101): spaces are derived from a probe
    # reset the first time any space property is read, so external RL
    # libraries (RLlib-style) can introspect obs/action shapes.
    # ------------------------------------------------------------------
    def _ensure_spaces(self):
        if self._spaces is not None:
            return
        from ai_economist_tpu.adapters import spaces as sp

        obs = self.reset()
        self._spaces = {
            "obs_a": sp.obs_dict_to_spaces(obs["0"]),
            "obs_p": sp.obs_dict_to_spaces(obs["p"]),
            "act_a": sp.action_space_from_layout(self.env.agent_action_space),
            "act_p": sp.action_space_from_layout(self.env.planner_action_space),
        }

    @property
    def observation_space(self):
        self._ensure_spaces()
        return self._spaces["obs_a"]

    @property
    def observation_space_pl(self):
        self._ensure_spaces()
        return self._spaces["obs_p"]

    @property
    def action_space(self):
        self._ensure_spaces()
        return self._spaces["act_a"]

    @property
    def action_space_pl(self):
        self._ensure_spaces()
        return self._spaces["act_p"]

    # ------------------------------------------------------------------
    def seed(self, seed: int):
        self._key = jax.random.PRNGKey(int(seed))

    @property
    def state(self):
        return self._state

    @property
    def episode_length(self):
        return self.env.episode_length

    def reset(self) -> Dict[str, Dict[str, np.ndarray]]:
        self._key, k = jax.random.split(self._key)
        if self._state is None:
            self._state = self.env.init_state(k)
        self._state, obs = self._reset_fn(self._state, k)
        return self._split_obs(obs)

    def step(self, actions: Optional[Dict] = None):
        actions = actions or {}
        a = np.zeros((self.n_agents,), np.int32)
        for idx in range(self.n_agents):
            if str(idx) in actions:
                a[idx] = int(actions[str(idx)])
            elif idx in actions:
                a[idx] = int(actions[idx])
        packed = {"a": jnp.asarray(a)}
        p_layout = self.env.planner_action_space
        if p_layout.n_subspaces > 0 and "p" in actions:
            packed["p"] = jnp.asarray(np.asarray(actions["p"], np.int32))
        self._state, obs, rew, done, info = self._step_fn(self._state, packed)
        obs_d = self._split_obs(obs)
        rew_d = {str(i): float(rew["a"][i]) for i in range(self.n_agents)}
        rew_d["p"] = float(rew["p"])
        done_d = {"__all__": bool(done)}
        return obs_d, rew_d, done_d, {}

    def metrics(self) -> Dict[str, float]:
        return {
            k: float(v) for k, v in jax.jit(self.env.metrics)(self._state).items()
        }

    # ------------------------------------------------------------------
    def _split_obs(self, obs):
        """Collated {"a","p"} obs -> per-agent-index dicts (numpy)."""
        out: Dict[str, Dict[str, np.ndarray]] = {}
        a_obs = jax.tree.map(np.asarray, obs["a"])
        for i in range(self.n_agents):
            out[str(i)] = {k: v[i] for k, v in a_obs.items()}
        p_obs = jax.tree.map(np.asarray, obs["p"])
        planner = {k: v for k, v in p_obs.items() if k != "pa"}
        if "pa" in p_obs:
            for i in range(self.n_agents):
                planner[f"p{i}"] = p_obs["pa"][i]
        out["p"] = planner
        return out
