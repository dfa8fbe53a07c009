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
    sequence_twin,
)
from ai_economist_tpu.training.ppo import PPOConfig, gae, ppo_loss

A_OBS_KEYS = ("world-map", "world-idx_map", "flat", "time", "action_mask")
P_OBS_KEYS = ("world-map", "world-idx_map", "flat", "time", "action_mask", "pa")
MAP_OBS_KEYS = ("world-map", "world-idx_map")


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
        # Whole-sequence twins for the PPO update: the conv/FC/LN torso and
        # heads run once over the folded [T*B] batch, only the LSTM cell
        # scans over time (models.ConvLSTMPolicySeq — same param tree).
        self.model_a_seq = sequence_twin(self.model_a)
        self.model_p_seq = sequence_twin(self.model_p)
        # Rollout-batch map-obs compression: when the scenario guarantees
        # byte-valued integer maps (wood_and_stone's windows byte_ok
        # guarantee), store "world-map"/"world-idx_map" as uint8 in the BPTT
        # batch. The cast is lossless (small ints), cuts the dominant
        # training HBM term 4x, and shrinks every whole-sequence copy XLA's
        # while-loop carries for the update scan.
        self._compress_maps = bool(
            getattr(env.scenario, "obs_maps_are_bytes", False)
        )

    def _compress_obs(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if not self._compress_maps:
            return obs
        return {
            k: (v.astype(jnp.uint8) if k in MAP_OBS_KEYS else v)
            for k, v in obs.items()
        }

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
                obs_a=self._compress_obs(_fold2(_select(obs["a"], A_OBS_KEYS))),
                obs_p=self._compress_obs(_select(obs["p"], P_OBS_KEYS)),
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
        adv, ret, entropy_coef, key, multi_dims=None, model_seq=None,
    ):
        """One PPO epoch over the rollout (BPTT from init_carry).

        Minibatches along the batch (env×agent) axis — each minibatch keeps
        its full T-length window and its own init_carry slice, so truncated
        BPTT stays intact (the reference trains with sgd_minibatch_size:
        3000, tutorials/rllib/phase1/config.yaml).

        The sequence is evaluated time-parallel wherever possible: via the
        model's whole-sequence twin (LSTM models — only the cell scans over
        T), or by folding T into the batch axis (carry-less models). The
        per-step scan of the full network remains only as the generic
        fallback; it is the slowest lowering on TPU (T tiny launches per
        epoch instead of a handful of [T*B]-sized ops)."""
        cfg = self.cfg

        def seq_logits_lp_ent(logits, value, act_s):
            """lp/ent from whole-sequence logits [T, B, A] + acts [T, B(,S)]."""
            if multi_dims is None:
                plogp = jax.nn.log_softmax(logits)
                lp = jnp.take_along_axis(
                    plogp, act_s[..., None], axis=-1
                )[..., 0]
                ent = -(jnp.exp(plogp) * plogp).sum(-1)
            else:
                lp = multi_subspace_log_prob(logits, act_s, multi_dims)
                ent = multi_subspace_entropy(logits, multi_dims)
            return lp, value, ent

        def loss_fn(p, mb):
            if model_seq is not None:
                logits, value, _ = model_seq.apply(p, mb["obs"], mb["carry"])
                lp, value, ent = seq_logits_lp_ent(logits, value, mb["act"])
            elif mb["carry"] is None:
                # No recurrence: one folded forward. Fold BATCH-major
                # ([B*T], B the sharded axis as the major dim) so the merge
                # preserves the batch sharding; a [T*B] fold would make
                # GSPMD all-gather the rollout across hosts.
                T, Bm = mb["act"].shape[:2]
                obs_f = jax.tree.map(
                    lambda x: jnp.swapaxes(x, 0, 1).reshape(
                        (Bm * T,) + x.shape[2:]),
                    mb["obs"],
                )
                logits, value, _ = model.apply(p, obs_f, None)
                logits = jnp.swapaxes(
                    logits.reshape((Bm, T) + logits.shape[1:]), 0, 1)
                lp, value, ent = seq_logits_lp_ent(
                    logits, jnp.swapaxes(value.reshape(Bm, T), 0, 1),
                    mb["act"])
            else:
                def scan_step(carry, xs):
                    obs_t, act_t = xs
                    logits, value, carry = model.apply(p, obs_t, carry)
                    return carry, seq_logits_lp_ent(logits, value, act_t)

                if cfg.remat:
                    # BPTT backward over the T-step scan otherwise stores
                    # every step's activations for the whole (env x agent)
                    # batch; recomputing in the backward pass is near-free
                    # for these op-granularity-bound policies.
                    scan_step = jax.checkpoint(scan_step)
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

        # Epochs as a lax.scan: ONE update-body in the program, looped.
        # (Unrolling epochs duplicates the whole fused-BPTT grad program,
        # which both bloats compile time and trips a TPU compiler
        # memory-space-assignment bug at chip-scale batches.)
        def epoch_step(carry, k_e):
            params_a, opt_a, params_p, opt_p = carry
            params_a, opt_a, aux_a = self._update_policy(
                self.model_a, params_a, opt_a, batch["obs_a"], init_carry_a,
                batch["act_a"], batch["logp_a"], adv_a, ret_a, ent_coef_a,
                jax.random.fold_in(k_e, 0), model_seq=self.model_a_seq,
            )
            if self.has_planner_actions and self.train_planner:
                params_p, opt_p, aux_p = self._update_policy(
                    self.model_p, params_p, opt_p, batch["obs_p"], init_carry_p,
                    batch["act_p"], batch["logp_p"], adv_p, ret_p, ent_coef_p,
                    jax.random.fold_in(k_e, 1),
                    multi_dims=self.p_layout.action_dims,
                    model_seq=self.model_p_seq,
                )
            else:
                aux_p = {k: jnp.zeros(()) for k in
                         ("policy_loss", "value_loss", "entropy")}
            return (params_a, opt_a, params_p, opt_p), (aux_a, aux_p)

        (params_a, opt_a, params_p, opt_p), (auxs_a, auxs_p) = jax.lax.scan(
            epoch_step,
            (ts.params_a, ts.opt_a, ts.params_p, ts.opt_p),
            jax.random.split(k_mb, self.cfg.epochs),
        )
        aux_a = jax.tree.map(lambda x: x[-1], auxs_a)
        aux_p = (jax.tree.map(lambda x: x[-1], auxs_p)
                 if self.has_planner_actions and self.train_planner else None)

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
