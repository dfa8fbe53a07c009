"""Two-level PPO trainer: agents ("a") + planner ("p"), fully on device.

TPU-native replacement for the reference's two training stacks:
  * the RLlib two-policy PPO harness (tutorials/rllib/training_script.py:
    48-122, policies "a" and "p" with policy-mapping by agent id), and
  * WarpDrive's on-GPU trainer (ai_economist/training/training_script.py:
    80-134).

Everything — rollout, GAE, PPO epochs — happens inside one jitted
`train_iteration`, with env replicas vmapped and (optionally) sharded over a
device mesh. LSTM carries are maintained per (env, agent) and reset on
episode boundaries; truncated BPTT re-runs the policy over each rollout
window from its stored initial carry (the RLlib max_seq_len=25 analog,
tutorials/rllib/phase1/config.yaml).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ai_economist_tpu.adapters.batched import auto_reset_step
from ai_economist_tpu.core.env import TpuEnv
from ai_economist_tpu.training.models import (
    ConvLSTMPolicy,
    LinearPolicy,
    MLPPolicy,
    RandomPolicy,
    multi_subspace_entropy,
    multi_subspace_log_prob,
    sample_multi_subspace,
)
from ai_economist_tpu.training.ppo import PPOConfig, gae, ppo_loss

A_OBS_KEYS = ("world-map", "world-idx_map", "flat", "time", "action_mask")
P_OBS_KEYS = ("world-map", "world-idx_map", "flat", "time", "action_mask", "pa")


def _select(obs: Dict[str, jnp.ndarray], keys) -> Dict[str, jnp.ndarray]:
    return {k: obs[k] for k in keys if k in obs}


def _fold2(tree):
    """[B, N, ...] -> [B*N, ...] on every leaf."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)


@struct.dataclass
class TrainerState:
    params_a: Any
    opt_a: Any
    params_p: Any
    opt_p: Any
    env_states: Any
    obs: Any
    carry_a: Any
    carry_p: Any
    key: jnp.ndarray
    iteration: jnp.ndarray


class TwoLevelTrainer:
    def __init__(
        self,
        env: TpuEnv,
        num_envs: int,
        cfg: Optional[PPOConfig] = None,
        model: str = "conv_lstm",
        train_planner: bool = True,
        model_kwargs: Optional[dict] = None,
        planner_model_kwargs: Optional[dict] = None,
        reset_mode: str = "fresh",
    ):
        self.env = env
        self.num_envs = int(num_envs)
        self.cfg = cfg or PPOConfig()
        self.n_agents = env.n_agents
        self.train_planner = bool(train_planner)
        # "fresh" = re-randomized episode layouts (the RLlib-path behavior the
        # paper curricula train on, tutorials/rllib/env_wrapper.py:207-211);
        # "rewind" = WarpDrive checkpoint rewind (env_wrapper.py:291-338).
        self.reset_mode = reset_mode

        a_actions = env.agent_action_space.total_actions
        self.p_layout = env.planner_action_space
        p_actions = self.p_layout.total_actions
        self.has_planner_actions = self.p_layout.n_subspaces > 0

        model_classes = {
            "conv_lstm": ConvLSTMPolicy,
            "mlp": MLPPolicy,
            "linear": LinearPolicy,
            "random": RandomPolicy,
        }
        if isinstance(model, str):
            model_a_name = model_p_name = model
        else:  # ("conv_lstm", "linear") style per-policy pair
            model_a_name, model_p_name = model
        self.model_a = model_classes[model_a_name](
            num_actions=a_actions, **(model_kwargs or {})
        )
        if not self.has_planner_actions:
            # No planner action subspaces in this build (e.g. saez taxes,
            # where rates come from the formula, not the planner): a trivial
            # 1-action random policy stands in — its outputs are never used.
            self.model_p = RandomPolicy(num_actions=1)
        else:
            self.model_p = model_classes[model_p_name](
                num_actions=p_actions, **(planner_model_kwargs or model_kwargs or {})
            )
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.adam(self.cfg.lr),
        )
        self._initial_states = None

    # ------------------------------------------------------------------
    def init(self, key) -> TrainerState:
        k_env, k_a, k_p, k_state = jax.random.split(key, 4)
        reset_b = jax.jit(jax.vmap(self.env.reset_fresh))
        env_states, obs = reset_b(jax.random.split(k_env, self.num_envs))
        self._initial_states = env_states

        obs_a = _fold2(_select(obs["a"], A_OBS_KEYS))
        carry_a = self.model_a.initial_carry(self.num_envs * self.n_agents)
        params_a = self.model_a.init(k_a, obs_a, carry_a)

        obs_p = _select(obs["p"], P_OBS_KEYS)
        carry_p = self.model_p.initial_carry(self.num_envs)
        params_p = self.model_p.init(k_p, obs_p, carry_p)

        return TrainerState(
            params_a=params_a,
            opt_a=self.tx.init(params_a),
            params_p=params_p,
            opt_p=self.tx.init(params_p),
            env_states=env_states,
            obs=obs,
            carry_a=carry_a,
            carry_p=carry_p,
            key=k_state,
            iteration=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _env_step(self, env_states, actions):
        nstates, obs, rew, done, _ = auto_reset_step(
            self.env, env_states, actions, self._initial_states,
            self.reset_mode,
        )
        return nstates, obs, rew, done

    def _policy_a(self, params, obs, carry):
        obs_a = _fold2(_select(obs["a"], A_OBS_KEYS))
        return self.model_a.apply(params, obs_a, carry)

    def _policy_p(self, params, obs, carry):
        obs_p = _select(obs["p"], P_OBS_KEYS)
        return self.model_p.apply(params, obs_p, carry)

    # ------------------------------------------------------------------
    def _rollout(self, ts: TrainerState, key):
        """Collect cfg.rollout_len steps. Returns (new live state, batch)."""
        B, N = self.num_envs, self.n_agents

        def step_fn(carry, key_t):
            env_states, obs, carry_a, carry_p = carry
            k_a, k_p = jax.random.split(key_t)

            logits_a, value_a, new_carry_a = self._policy_a(
                ts.params_a, obs, carry_a
            )
            act_a = jax.random.categorical(k_a, logits_a, axis=-1)  # [B*N]
            logp_a = jnp.take_along_axis(
                jax.nn.log_softmax(logits_a), act_a[:, None], axis=1
            )[:, 0]

            actions = {"a": act_a.reshape(B, N).astype(jnp.int32)}
            if self.has_planner_actions:
                logits_p, value_p, new_carry_p = self._policy_p(
                    ts.params_p, obs, carry_p
                )
                act_p = sample_multi_subspace(
                    k_p, logits_p, self.p_layout.action_dims
                )  # [B, S]
                logp_p = multi_subspace_log_prob(
                    logits_p, act_p, self.p_layout.action_dims
                )
                actions["p"] = act_p
            else:
                value_p = jnp.zeros((B,))
                act_p = jnp.zeros((B, 1), jnp.int32)
                logp_p = jnp.zeros((B,))
                new_carry_p = carry_p

            nstates, nobs, rew, done = self._env_step(env_states, actions)

            # Reset RNN carries on episode boundary.
            def reset_carry(c, batch_repeat):
                if c is None:
                    return None
                d = jnp.repeat(done, batch_repeat)
                return jax.tree.map(
                    lambda x: jnp.where(d[:, None], 0.0, x), c
                )

            new_carry_a = reset_carry(new_carry_a, N)
            new_carry_p = reset_carry(new_carry_p, 1)

            record = dict(
                obs_a=_fold2(_select(obs["a"], A_OBS_KEYS)),
                obs_p=_select(obs["p"], P_OBS_KEYS),
                act_a=act_a,
                logp_a=logp_a,
                val_a=value_a,
                rew_a=rew["a"].reshape(B * N),
                act_p=act_p,
                logp_p=logp_p,
                val_p=value_p,
                rew_p=rew["p"],
                done=done,
            )
            return (nstates, nobs, new_carry_a, new_carry_p), record

        keys = jax.random.split(key, self.cfg.rollout_len)
        init = (ts.env_states, ts.obs, ts.carry_a, ts.carry_p)
        (env_states, obs, carry_a, carry_p), batch = jax.lax.scan(
            step_fn, init, keys
        )
        # Bootstrap values at the post-rollout obs.
        _, last_val_a, _ = self._policy_a(ts.params_a, obs, carry_a)
        if self.has_planner_actions:
            _, last_val_p, _ = self._policy_p(ts.params_p, obs, carry_p)
        else:
            last_val_p = jnp.zeros((self.num_envs,))
        batch["last_val_a"] = last_val_a
        batch["last_val_p"] = last_val_p
        return (env_states, obs, carry_a, carry_p), batch

    # ------------------------------------------------------------------
    def _update_policy(
        self, model, params, opt_state, obs_seq, init_carry, act, logp_old,
        adv, ret, entropy_coef, key, multi_dims=None,
    ):
        """One PPO epoch over the rollout (BPTT from init_carry).

        Minibatches along the batch (env×agent) axis — each minibatch keeps
        its full T-length window and its own init_carry slice, so truncated
        BPTT stays intact (the reference trains with sgd_minibatch_size:
        3000, tutorials/rllib/phase1/config.yaml)."""
        cfg = self.cfg

        def loss_fn(p, mb):
            def scan_step(carry, xs):
                obs_t, act_t = xs
                logits, value, carry = model.apply(p, obs_t, carry)
                if multi_dims is None:
                    lp = jnp.take_along_axis(
                        jax.nn.log_softmax(logits), act_t[:, None], axis=1
                    )[:, 0]
                    plogp = jax.nn.log_softmax(logits)
                    ent = -(jnp.exp(plogp) * plogp).sum(-1)
                else:
                    lp = multi_subspace_log_prob(logits, act_t, multi_dims)
                    ent = multi_subspace_entropy(logits, multi_dims)
                return carry, (lp, value, ent)

            _, (lp, value, ent) = jax.lax.scan(
                scan_step, mb["carry"], (mb["obs"], mb["act"])
            )
            ratio = jnp.exp(lp - mb["logp_old"])
            a = (mb["adv"] - mb["adv"].mean()) / (mb["adv"].std() + 1e-8)
            pl = -jnp.minimum(
                ratio * a,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * a,
            ).mean()
            vl = 0.5 * ((value - mb["ret"]) ** 2).mean()
            e = ent.mean()
            total = pl + cfg.vf_coef * vl - entropy_coef * e
            return total, {"policy_loss": pl, "value_loss": vl, "entropy": e}

        n_mb = max(1, int(cfg.num_minibatches))
        batch_size = act.shape[1]
        # The minibatch count must divide the batch: silently adjusting it
        # would train with a different SGD configuration than the user asked
        # for (sgd_minibatch_size semantics, tutorials/rllib/phase1/config.yaml).
        if batch_size % n_mb:
            raise ValueError(
                f"num_minibatches={n_mb} does not divide the env batch "
                f"({batch_size}); pick a divisor so every sample lands in "
                f"exactly one minibatch"
            )
        mb_size = batch_size // n_mb
        if n_mb > 1:
            perm = jax.random.permutation(key, batch_size)
        else:
            # No permutation with one minibatch — and crucially, no batch
            # indexing AT ALL: under a sharded env axis, x[:, arange] is a
            # gather from the sharded dim, which GSPMD emulates by
            # all-reducing the ENTIRE rollout batch across hosts and then
            # running the update replicated (caught by
            # tools/collective_audit.py). Passing the arrays through keeps
            # the batch sharded and the update data-parallel, with only
            # param-gradient all-reduces crossing hosts.
            perm = None

        aux = None
        for i in range(n_mb):
            if perm is None:
                mb = {
                    "obs": obs_seq,
                    "act": act,
                    "logp_old": logp_old,
                    "adv": adv,
                    "ret": ret,
                    "carry": init_carry,
                }
            else:
                idx = perm[i * mb_size:(i + 1) * mb_size]
                mb = {
                    "obs": jax.tree.map(lambda x: x[:, idx], obs_seq),
                    "act": act[:, idx],
                    "logp_old": logp_old[:, idx],
                    "adv": adv[:, idx],
                    "ret": ret[:, idx],
                    "carry": jax.tree.map(lambda c: c[idx], init_carry)
                    if init_carry is not None else None,
                }
            grads, aux = jax.grad(loss_fn, has_aux=True)(params, mb)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def train_iteration(self, ts: TrainerState, ent_coef_a, ent_coef_p):
        key, k_roll, k_mb = jax.random.split(ts.key, 3)
        init_carry_a, init_carry_p = ts.carry_a, ts.carry_p
        (env_states, obs, carry_a, carry_p), batch = self._rollout(ts, k_roll)

        B, N, T = self.num_envs, self.n_agents, self.cfg.rollout_len
        done_a = jnp.repeat(batch["done"], N, axis=-1).reshape(T, B * N)
        adv_a, ret_a = gae(
            batch["rew_a"], batch["val_a"], done_a, batch["last_val_a"],
            self.cfg.gamma, self.cfg.gae_lambda,
        )
        adv_p, ret_p = gae(
            batch["rew_p"], batch["val_p"], batch["done"], batch["last_val_p"],
            self.cfg.gamma, self.cfg.gae_lambda,
        )

        params_a, opt_a = ts.params_a, ts.opt_a
        params_p, opt_p = ts.params_p, ts.opt_p
        aux_a = aux_p = None
        for e in range(self.cfg.epochs):
            k_e = jax.random.fold_in(k_mb, e)
            params_a, opt_a, aux_a = self._update_policy(
                self.model_a, params_a, opt_a, batch["obs_a"], init_carry_a,
                batch["act_a"], batch["logp_a"], adv_a, ret_a, ent_coef_a,
                jax.random.fold_in(k_e, 0),
            )
            if self.has_planner_actions and self.train_planner:
                params_p, opt_p, aux_p = self._update_policy(
                    self.model_p, params_p, opt_p, batch["obs_p"], init_carry_p,
                    batch["act_p"], batch["logp_p"], adv_p, ret_p, ent_coef_p,
                    jax.random.fold_in(k_e, 1),
                    multi_dims=self.p_layout.action_dims,
                )

        metrics = {
            "reward_a_mean": batch["rew_a"].sum(0).mean() ,
            "reward_p_mean": batch["rew_p"].sum(0).mean(),
            "episodes_completed": env_states.completions.sum(),
        }
        for tag, aux in (("a", aux_a), ("p", aux_p)):
            if aux is not None:
                metrics.update({f"{tag}/{k}": v for k, v in aux.items()})

        new_ts = TrainerState(
            params_a=params_a, opt_a=opt_a, params_p=params_p, opt_p=opt_p,
            env_states=env_states, obs=obs, carry_a=carry_a, carry_p=carry_p,
            key=key, iteration=ts.iteration + 1,
        )
        return new_ts, metrics

    # ------------------------------------------------------------------
    def train(self, key, num_iterations: int, log_every: int = 10,
              ent_schedule_a=None, ent_schedule_p=None, callback=None):
        ts = self.init(key)
        history = []
        for it in range(num_iterations):
            ca = ent_schedule_a(it) if ent_schedule_a else self.cfg.entropy_coef
            cp = ent_schedule_p(it) if ent_schedule_p else self.cfg.entropy_coef
            ts, metrics = self.train_iteration(ts, ca, cp)
            if it % log_every == 0 or it == num_iterations - 1:
                m = {k: float(v) for k, v in metrics.items()}
                history.append({"iteration": it, **m})
                if callback:
                    callback(it, m)
        return ts, history
