"""RBC training harness: consumer/firm/government actor-critics, on device.

Compact TPU-native equivalent of the reference's
ConsumerFirmRunManagerBatchParallel (rbc/cuda_manager.py:589-1916): batched
episode rollouts fully inside one jitted function (lax.scan over the episode),
PPO-style updates per agent class with a training-start curriculum, theta
annealing, and a no-Ponzi penalty on negative terminal budgets
(cuda_manager.py:148-182).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ai_economist_tpu.scenarios.rbc.env import RBCConfig, RBCEnvironment


class MultiHeadPolicy(nn.Module):
    """2x128 tanh MLP with one categorical head per action dimension and a
    value head (rbc/networks.py:12-93)."""

    head_dims: tuple
    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(self.hidden)(x))
        h = nn.tanh(nn.Dense(self.hidden)(h))
        logits = [nn.Dense(d)(h) for d in self.head_dims]
        value = nn.Dense(1)(h)[..., 0]
        return logits, value


class RBCTrainConfig(NamedTuple):
    batch_size: int = 32
    lr: float = 0.001
    gamma: float = 0.9999
    entropy: float = 0.01
    value_loss_weight: float = 1.0
    clip_eps: float = 0.2
    no_ponzi_coef: float = 0.0
    theta_anneal_per_episode: float = 1.0
    consumer_training_start: int = 0
    firm_training_start: int = 0
    government_training_start: int = 0


def _digit_expand(x, dims, max_digits=10):
    """Reference digit representation (rbc/util.py:82-105): for each dim in
    `dims`, value v expands to max_digits entries (v % 10^(j+1)) / 10^(j+1);
    other dims pass through in place. Keeps large-magnitude features
    (budgets, stocks) O(1) for the policy MLPs."""
    pieces = []
    for i in range(x.shape[-1]):
        if i in dims:
            v = x[..., i]
            pieces.append(jnp.stack(
                [(v % (10.0 ** (j + 1))) / (10.0 ** (j + 1))
                 for j in range(max_digits)], axis=-1))
        else:
            pieces.append(x[..., i:i + 1])
    return jnp.concatenate(pieces, axis=-1)


class RBCTrainer:
    def __init__(self, env: RBCEnvironment, cfg: RBCTrainConfig = RBCTrainConfig()):
        self.env = env
        self.cfg = cfg
        dims = env.action_dims
        self.policies = {
            k: MultiHeadPolicy(head_dims=tuple(dims[k])) for k in dims
        }
        self.tx = optax.adam(cfg.lr)

        # Reference-style obs normalization (rbc/constants.py:595-645 scaling
        # factors + rbc/util.py:82-112 digit expansion): prices/wages/time
        # scale to O(1); firm stocks and the agent's own budget — the
        # unbounded-magnitude dims — expand to digit form.
        import numpy as np

        ecfg = env.cfg
        F, G = ecfg.n_firms, ecfg.global_state_dim
        max_price = max(float(np.max(np.asarray(ecfg.price_levels))), 1.0)
        max_wage = max(float(np.max(np.asarray(ecfg.wage_levels))), 1.0)
        gscale = np.ones((G,), np.float32)
        gscale[:F] = max_price
        gscale[F:2 * F] = max_wage
        gscale[-1] = float(ecfg.episode_length)
        theta_scale = max(float(ecfg.consumer_theta), 1e-9)
        self._obs_scales = {
            "consumer": np.concatenate([gscale, [1.0, theta_scale]]),
            "firm": np.concatenate(
                [gscale, [1.0, 10000.0, 1.0], np.ones((F,), np.float32)]
            ),
            "government": gscale,
        }
        stock_dims = tuple(range(2 * F, 3 * F))
        self._digit_dims = {
            "consumer": stock_dims + (G,),  # + own budget
            "firm": stock_dims + (G,),
            "government": stock_dims,
        }

    def _norm_obs(self, klass, x):
        return _digit_expand(
            x / jnp.asarray(self._obs_scales[klass]), self._digit_dims[klass]
        )

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        state, obs = self.env.reset(k4)
        params = {}
        for k, kk in zip(("consumer", "firm", "government"), (k1, k2, k3)):
            o = obs[k] if obs[k].ndim == 2 else obs[k][None]
            params[k] = self.policies[k].init(kk, self._norm_obs(k, o))
        opt = {k: self.tx.init(params[k]) for k in params}
        return params, opt

    # ------------------------------------------------------------------
    def _sample_heads(self, key, logits_list):
        acts, logps, ents = [], 0.0, 0.0
        keys = jax.random.split(key, len(logits_list))
        for k, logits in zip(keys, logits_list):
            a = jax.random.categorical(k, logits, axis=-1)
            lp = jax.nn.log_softmax(logits)
            logps = logps + jnp.take_along_axis(lp, a[..., None], -1)[..., 0]
            ents = ents + (-(jnp.exp(lp) * lp).sum(-1))
            acts.append(a)
        return jnp.stack(acts, axis=-1), logps, ents

    def _heads_log_prob(self, logits_list, actions):
        logps, ents = 0.0, 0.0
        for i, logits in enumerate(logits_list):
            lp = jax.nn.log_softmax(logits)
            logps = logps + jnp.take_along_axis(
                lp, actions[..., i : i + 1], -1
            )[..., 0]
            ents = ents + (-(jnp.exp(lp) * lp).sum(-1))
        return logps, ents

    # ------------------------------------------------------------------
    def rollout(self, params, key, theta_anneal=1.0):
        """One batched episode. Returns per-class trajectories."""
        B = self.cfg.batch_size
        T = self.env.cfg.episode_length
        k_reset, k_steps = jax.random.split(key)
        reset_keys = jax.random.split(k_reset, B)
        states, obs = jax.vmap(
            lambda k: self.env.reset(k, theta_anneal)
        )(reset_keys)

        def policy_step(params, obs, key):
            ka, kf, kg = jax.random.split(key, 3)
            out = {}
            for k, kk in (("consumer", ka), ("firm", kf), ("government", kg)):
                o = self._norm_obs(k, obs[k])
                logits, value = self.policies[k].apply(params[k], o)
                acts, logp, ent = self._sample_heads(kk, logits)
                out[k] = (acts, logp, value)
            return out

        def step_fn(carry, key_t):
            states, obs = carry
            keys = jax.random.split(key_t, B)
            pol = jax.vmap(lambda o, k: policy_step(params, o, k))(obs, keys)
            actions = {k: pol[k][0] for k in pol}
            g_act = actions["government"]
            actions = {
                "consumer": actions["consumer"],
                "firm": actions["firm"][..., 0],
                "government": g_act[..., 0],
            }
            nstates, nobs, rew, done, _ = jax.vmap(self.env.step)(states, actions)
            rec = {
                k: dict(
                    obs=obs[k], act=pol[k][0], logp=pol[k][1],
                    val=pol[k][2], rew=rew[k],
                )
                for k in ("consumer", "firm", "government")
            }
            return (nstates, nobs), rec

        step_keys = jax.random.split(k_steps, T)
        (final_states, _), traj = jax.lax.scan(step_fn, (states, obs), step_keys)
        return final_states, traj

    # ------------------------------------------------------------------
    def _class_update(self, name, params, opt_state, traj, final_budget=None):
        cfg = self.cfg

        rew = traj["rew"]  # [T, B, ...]
        # Discounted returns (cuda_manager.py:71-79).
        def disc(carry, r):
            g = r + cfg.gamma * carry
            return g, g

        _, returns = jax.lax.scan(disc, jnp.zeros_like(rew[-1]), rew, reverse=True)
        adv = returns - traj["val"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        def loss_fn(p):
            obs = self._norm_obs(name, traj["obs"])
            logits, value = self.policies[name].apply(p, obs)
            logp, ent = self._heads_log_prob(logits, traj["act"])
            ratio = jnp.exp(logp - traj["logp"])
            pl = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv,
            ).mean()
            vl = ((value - returns) ** 2).mean()
            loss = pl + cfg.value_loss_weight * vl - cfg.entropy * ent.mean()
            if cfg.no_ponzi_coef > 0.0 and final_budget is not None:
                loss = loss + cfg.no_ponzi_coef * jnp.maximum(
                    -final_budget, 0.0
                ).mean()
            return loss, {"policy_loss": pl, "value_loss": vl,
                          "entropy": ent.mean(), "return": returns[0].mean()}

        grads, aux = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def train_episode(self, params, opt, key, episode_idx, theta_anneal):
        final_states, traj = self.rollout(params, key, theta_anneal)
        metrics = {}
        gates = {
            "consumer": episode_idx >= self.cfg.consumer_training_start,
            "firm": episode_idx >= self.cfg.firm_training_start,
            "government": episode_idx >= self.cfg.government_training_start,
        }
        budgets = {
            "consumer": final_states.consumer_budget,
            "firm": final_states.firm_budget,
            "government": None,
        }
        new_params, new_opt = {}, {}
        for k in ("consumer", "firm", "government"):
            p2, o2, aux = self._class_update(
                k, params[k], opt[k], traj[k], budgets[k]
            )
            gate = gates[k]
            new_params[k] = jax.tree.map(
                lambda new, old: jnp.where(gate, new, old), p2, params[k]
            )
            new_opt[k] = jax.tree.map(
                lambda new, old: jnp.where(gate, new, old), o2, opt[k]
            )
            metrics.update({f"{k}/{kk}": vv for kk, vv in aux.items()})
        metrics["consumer/final_budget"] = final_states.consumer_budget.mean()
        metrics["firm/final_budget"] = final_states.firm_budget.mean()
        return new_params, new_opt, metrics

    def train(self, key, num_episodes: int, callback=None):
        params, opt = self.init(key)
        history = []
        theta = 1.0
        for ep in range(num_episodes):
            key, k = jax.random.split(key)
            params, opt, metrics = self.train_episode(
                params, opt, k, jnp.asarray(ep), jnp.asarray(theta)
            )
            theta *= self.cfg.theta_anneal_per_episode
            m = {kk: float(vv) for kk, vv in metrics.items()}
            history.append(m)
            if callback:
                callback(ep, m)
        return params, history

    # ------------------------------------------------------------------
    # Best-response mode (reference rbc/cuda_manager.py:1051-1382):
    # all three classes act from their (pre-trained) policies during the
    # rollout, but ONLY `train_type` receives gradient updates — the other
    # two stay byte-identical, serving as a fixed environment against which
    # the trained class computes its best response.
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 5))
    def bestresponse_episode(self, params, opt_state, key, theta_anneal, train_type):
        final_states, traj = self.rollout(params, key, theta_anneal)
        budgets = {
            "consumer": final_states.consumer_budget,
            "firm": final_states.firm_budget,
            "government": None,
        }
        p2, o2, aux = self._class_update(
            train_type, params[train_type], opt_state, traj[train_type],
            budgets[train_type],
        )
        new_params = dict(params)
        new_params[train_type] = p2
        metrics = {f"{train_type}/{kk}": vv for kk, vv in aux.items()}
        for k in ("consumer", "firm", "government"):
            metrics[f"{k}/mean_reward"] = traj[k]["rew"].mean()
        return new_params, o2, metrics

    def bestresponse_train(
        self, key, train_type: str, num_episodes: int, params=None, callback=None
    ):
        """Best-response harness (cuda_manager.py:1051-1382 analog).

        `params`: pre-trained per-class params (e.g. from `train` or a
        checkpoint); falls back to a fresh init when None (the reference
        always loads saved policies — pass yours for the real protocol).
        Returns (params, reward_history) where reward_history[i] is the
        trained class's mean episode reward, mirroring the reference's
        printed starting/ending reward improvement summary (:1376-1380).
        """
        assert train_type in ("consumer", "firm", "government")
        if params is None:
            params, _ = self.init(key)
        opt_state = self.tx.init(params[train_type])
        rewards = []
        history = []
        for ep in range(num_episodes):
            key, k = jax.random.split(key)
            params, opt_state, metrics = self.bestresponse_episode(
                params, opt_state, k, jnp.asarray(1.0), train_type
            )
            m = {kk: float(vv) for kk, vv in metrics.items()}
            rewards.append(m[f"{train_type}/mean_reward"])
            history.append(m)
            if callback:
                callback(ep, m)
        return params, rewards, history
