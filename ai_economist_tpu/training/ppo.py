"""PPO losses and generalized advantage estimation (pure jnp).

The on-device analog of the reference training stacks: RLlib PPO
(tutorials/rllib/training_script.py:48-122) and the RBC hand-rolled PPO
(real_business_cycle/rbc/cuda_manager.py:237-474).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PPOConfig(NamedTuple):
    gamma: float = 0.998
    gae_lambda: float = 0.98
    clip_eps: float = 0.2
    vf_coef: float = 0.05
    entropy_coef: float = 0.025
    lr: float = 3e-4
    epochs: int = 2
    num_minibatches: int = 1
    max_grad_norm: float = 10.0
    rollout_len: int = 25
    # Rematerialize the per-step policy apply in the BPTT backward pass:
    # O(1)-in-T activation memory instead of O(T), at the cost of one extra
    # forward (near-free for these op-bound policies). Required for
    # chip-scale replica counts (2048+); gradients are bit-identical.
    remat: bool = True


def gae(rewards, values, dones, last_value, gamma, lam):
    """GAE over a [T, ...] rollout. dones[t] marks episode end AT step t.

    Returns (advantages [T, ...], returns [T, ...]).
    """
    def body(carry, xs):
        next_adv, next_value = carry
        rew, val, done = xs
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = rew + gamma * next_value * nonterminal - val
        adv = delta + gamma * lam * nonterminal * next_adv
        return (adv, val), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advs, advs + values


def ppo_loss(log_prob, old_log_prob, advantages, values, returns, entropy, cfg):
    """Clipped PPO surrogate + value loss - entropy bonus. Inputs flattened."""
    ratio = jnp.exp(log_prob - old_log_prob)
    adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv
    policy_loss = -jnp.minimum(unclipped, clipped).mean()
    value_loss = 0.5 * ((values - returns) ** 2).mean()
    ent = entropy.mean()
    total = policy_loss + cfg.vf_coef * value_loss - cfg.entropy_coef * ent
    return total, {
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": ent,
    }
