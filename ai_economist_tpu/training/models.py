"""Policy networks: ConvLSTM (paper architecture) and MLP actor-critics.

TPU-native flax equivalents of the reference models:
  * ConvLSTMPolicy mirrors KerasConvLSTM (tutorials/rllib/tf_models.py:57-317):
    embedding of agent-index map channels, strided conv stack (16 then 32
    filters, stride 2, relu), FC stack + LayerNorm, separate policy/value
    LSTMs, and -1e7 additive logit masking (tf_models.py:48-54).
  * MLPPolicy mirrors the RBC nets (real_business_cycle/rbc/networks.py:12-93):
    2x128 tanh MLP with softmax heads.

All models are step-wise: __call__ consumes one timestep and an RNN carry;
training scans them over time with `jax.lax.scan`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LOGIT_MASK_VALUE = -1e7


def apply_logit_mask(logits: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return logits
    return logits + LOGIT_MASK_VALUE * (1.0 - mask)


class _ConvTower(nn.Module):
    num_conv: int = 2

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        x = nn.relu(nn.Conv(16, (3, 3), strides=2, padding="VALID")(x))
        for _ in range(self.num_conv - 1):
            x = nn.relu(nn.Conv(32, (3, 3), strides=2, padding="VALID")(x))
        return x.reshape(x.shape[0], -1)


class ConvLSTMPolicy(nn.Module):
    """Paper policy: conv over spatial obs + FC + LN + LSTM, masked logits.

    Call with obs dict {"world-map": [B,C,H,W] (optional), "world-idx_map":
    [B,Ci,H,W] (optional), "flat": [B,F], "time": [B,1] (optional),
    "action_mask": [B,A]} and carry ((h_p, c_p), (h_v, c_v)).
    Returns (logits [B,A], value [B], new_carry).
    """

    num_actions: int
    input_emb_vocab: int = 100
    emb_dim: int = 4
    num_conv: int = 2
    num_fc: int = 2
    fc_dim: int = 128
    cell_size: int = 128

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], carry):
        (pol_carry, val_carry) = carry
        use_conv = "world-map" in obs

        flat_parts = [obs["flat"]]
        if "time" in obs:
            t = obs["time"]
            flat_parts.append(t if t.ndim == 2 else t[:, None])
        if "pa" in obs:  # planner: agent-wise sub-obs [B, N, F] -> [B, N*F]
            flat_parts.append(obs["pa"].reshape(obs["pa"].shape[0], -1))
        non_conv = jnp.concatenate(flat_parts, axis=-1)

        outs = []
        new_carries = []
        for tag, cr in (("pol", pol_carry), ("val", val_carry)):
            if use_conv:
                wm = jnp.transpose(obs["world-map"], (0, 2, 3, 1))  # BHWC
                idx = obs["world-idx_map"].astype(jnp.int32)
                emb = nn.Embed(
                    self.input_emb_vocab, self.emb_dim, name=f"embedding_{tag}"
                )(jnp.transpose(idx, (0, 2, 3, 1)))
                emb = emb.reshape(emb.shape[:3] + (-1,))
                conv_in = jnp.concatenate([wm, emb], axis=-1)
                conv_out = _ConvTower(self.num_conv, name=f"conv_{tag}")(conv_in)
                dense = jnp.concatenate([conv_out, non_conv], axis=-1)
            else:
                dense = non_conv
            for i in range(self.num_fc):
                dense = nn.relu(nn.Dense(self.fc_dim, name=f"dense{i + 1}_{tag}")(dense))
            dense = nn.LayerNorm(name=f"ln_{tag}")(dense)
            cell = nn.OptimizedLSTMCell(self.cell_size, name=f"lstm_{tag}")
            new_cr, lstm_out = cell(cr, dense)
            new_carries.append(new_cr)
            head_dim = self.num_actions if tag == "pol" else 1
            outs.append(nn.Dense(head_dim, name=f"head_{tag}")(lstm_out))

        logits = apply_logit_mask(outs[0], obs.get("action_mask"))
        value = outs[1][..., 0]
        return logits, value, (new_carries[0], new_carries[1])

    def initial_carry(self, batch_size: int):
        zeros = jnp.zeros((batch_size, self.cell_size), jnp.float32)
        return ((zeros, zeros), (zeros, zeros))


class MLPPolicy(nn.Module):
    """2-hidden-layer tanh MLP actor-critic (rbc/networks.py:29-52)."""

    num_actions: int
    hidden: int = 128

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], carry=None):
        x = obs["flat"]
        if "time" in obs:
            t = obs["time"]
            x = jnp.concatenate([x, t if t.ndim == 2 else t[:, None]], axis=-1)
        if "pa" in obs:
            x = jnp.concatenate([x, obs["pa"].reshape(obs["pa"].shape[0], -1)], -1)
        h = nn.tanh(nn.Dense(self.hidden)(x))
        h = nn.tanh(nn.Dense(self.hidden)(h))
        logits = apply_logit_mask(
            nn.Dense(self.num_actions)(h), obs.get("action_mask")
        )
        value = nn.Dense(1)(h)[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int):
        return None


class LinearPolicy(nn.Module):
    """Single linear layer actor-critic (tf_models.py:320-383 KerasLinear).

    Useful as the planner policy during phase-1 curriculum, where the
    reference trains the planner with a linear model ("LINEAR" in
    tutorials/rllib/phase1/config.yaml).
    """

    num_actions: int

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], carry=None):
        parts = []
        for k in ("world-map", "world-idx_map"):
            if k in obs:
                parts.append(obs[k].reshape(obs[k].shape[0], -1).astype(jnp.float32))
        parts.append(obs["flat"])
        if "time" in obs:
            t = obs["time"]
            parts.append(t if t.ndim == 2 else t[:, None])
        if "pa" in obs:
            parts.append(obs["pa"].reshape(obs["pa"].shape[0], -1))
        x = jnp.concatenate(parts, axis=-1)
        logits = apply_logit_mask(
            nn.Dense(self.num_actions, name="logits")(x), obs.get("action_mask")
        )
        value = nn.Dense(1, name="value")(x)[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int):
        return None


class RandomPolicy(nn.Module):
    """Uniform-over-valid-actions no-learn policy (tf_models.py:386-435
    RandomAction): zero logits + mask, value head present but meaningless."""

    num_actions: int

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], carry=None):
        b = obs["flat"].shape[0]
        # A throwaway parameter so init/apply have a non-empty param tree
        # (mirrors the reference's untrainable value branch).
        bias = self.param("value_bias", nn.initializers.zeros, (1,))
        logits = apply_logit_mask(
            jnp.zeros((b, self.num_actions)), obs.get("action_mask")
        )
        value = jnp.zeros((b,)) + bias[0] * 0.0
        return logits, value, carry

    def initial_carry(self, batch_size: int):
        return None


class DeterministicPolicy:
    """Frozen argmax wrapper around a trained policy
    (real_business_cycle/rbc/networks.py:95-115): used to hold one agent
    class fixed during best-response training. Not a flax module — wraps
    (model, params) and exposes the same (logits, value, carry) interface
    with one-hot argmax logits and stopped gradients."""

    def __init__(self, model, params):
        self.model = model
        self.params = params

    def __call__(self, obs, carry=None):
        logits, value, carry = self.model.apply(self.params, obs, carry)
        logits = jax.lax.stop_gradient(logits)
        greedy = jnp.argmax(logits, axis=-1)
        one_hot = jax.nn.one_hot(greedy, logits.shape[-1])
        det_logits = apply_logit_mask(one_hot * 1e9, obs.get("action_mask"))
        return det_logits, jax.lax.stop_gradient(value), carry

    def initial_carry(self, batch_size: int):
        return self.model.initial_carry(batch_size)


def expand_to_digit_form(x, max_magnitude: float = 1e6, base: int = 10):
    """Expand large-magnitude features into per-digit channels
    (real_business_cycle/rbc/util.py:82-112): each value v >= 0 becomes
    [d_0/base, d_1/base, ...] over `ceil(log_base(max_magnitude))` digits,
    keeping every input channel O(1) for the policy MLP. Vectorized: x
    [..., F] -> [..., F * n_digits]."""
    import math

    n_digits = max(1, int(math.ceil(math.log(max_magnitude) / math.log(base))))
    v = jnp.maximum(x, 0.0)
    digits = []
    for d in range(n_digits):
        digits.append(jnp.floor(v / (base ** d)) % base / float(base))
    return jnp.concatenate(digits, axis=-1)


def size_after_digit_expansion(n_features: int, max_magnitude: float = 1e6, base: int = 10):
    import math

    n_digits = max(1, int(math.ceil(math.log(max_magnitude) / math.log(base))))
    return n_features * n_digits


def sample_multi_subspace(key, logits, action_dims):
    """Sample one action per subspace from flat masked logits.

    For a multi-action-mode agent (the planner), logits covers the
    concatenated per-subspace distributions; returns [B, S] int32.
    """
    outs, off = [], 0
    keys = jax.random.split(key, len(action_dims))
    for k, dim in zip(keys, action_dims):
        outs.append(jax.random.categorical(k, logits[..., off : off + dim], axis=-1))
        off += dim
    return jnp.stack(outs, axis=-1).astype(jnp.int32)


def multi_subspace_log_prob(logits, actions, action_dims):
    """Sum of per-subspace log-probs for multi-action-mode agents."""
    total, off = 0.0, 0
    for i, dim in enumerate(action_dims):
        lp = jax.nn.log_softmax(logits[..., off : off + dim], axis=-1)
        total = total + jnp.take_along_axis(
            lp, actions[..., i : i + 1], axis=-1
        )[..., 0]
        off += dim
    return total


def multi_subspace_entropy(logits, action_dims):
    total, off = 0.0, 0
    for dim in action_dims:
        lp = jax.nn.log_softmax(logits[..., off : off + dim], axis=-1)
        p = jnp.exp(lp)
        total = total + (-(p * lp).sum(-1))
        off += dim
    return total
