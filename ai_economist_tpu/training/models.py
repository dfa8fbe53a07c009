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

from ai_economist_tpu.ops.embed import embed_lookup

LOGIT_MASK_VALUE = -1e7


def apply_logit_mask(logits: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return logits
    return logits + LOGIT_MASK_VALUE * (1.0 - mask)


class OneHotEmbed(nn.Module):
    """nn.Embed drop-in whose lookup is a one-hot CONTRACTION, not a gather.

    TPU gathers/scatters over a tiny table serialize: profiled at 2048-env
    training batches, nn.Embed's forward lookup plus its scatter-add table
    gradient were ~75% of the whole train iteration (86 ms per 10M-index
    scatter into [100, 4]). Expressed as `onehot(idx) @ table`, the forward
    is an MXU matmul whose one-hot operand fuses into the tiles (never
    materialized), and the table gradient is the transposed contraction —
    also a matmul, no scatter. Forward values are bit-exact vs the gather
    (exactly one nonzero per row). Same param name/shape/init as nn.Embed,
    so checkpoints are interchangeable.
    """

    num_embeddings: int
    features: int
    # merge_last_axis: treat idx's last axis as C parallel index channels
    # and emit their embeddings CONCATENATED ([..., C*features]) straight
    # from one contraction with a block-diagonal kron(eye(C), table) — the
    # separate [..., C, features] intermediate (minor dim `features`, tile-
    # padded up to 32x) never exists.
    merge_last_axis: bool = False
    # Output dtype (params stay f32). bf16 when the consumer is a conv:
    # XLA converts conv operands to bf16 regardless, and emitting bf16
    # directly halves every relayout of this training-batch-sized tensor.
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal",
                                             out_axis=0),
            (self.num_embeddings, self.features),
        )
        # ops/embed.py: Pallas VMEM contraction on TPU at training batch
        # sizes (the one-hot never reaches HBM — round-5 trace showed the
        # einsum path's materialized one-hots were ~70% of a 2048-env train
        # iteration); bit-identical one-hot einsum off TPU / at small sizes.
        if self.merge_last_axis:
            return embed_lookup(table, idx, self.out_dtype)
        return embed_lookup(table, idx[..., None], self.out_dtype)


class _ConvTower(nn.Module):
    num_conv: int = 2

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C], bf16 on the hot path
        # dtype=input dtype: params stay f32 but compute follows the input
        # (bf16 multiplies, f32 accumulation on the MXU — what XLA lowers
        # f32 convs to anyway). The f32 cast happens on the small flattened
        # features, not the conv feature maps.
        dt = x.dtype
        x = nn.relu(nn.Conv(16, (3, 3), strides=2, padding="VALID",
                            dtype=dt)(x))
        for _ in range(self.num_conv - 1):
            x = nn.relu(nn.Conv(32, (3, 3), strides=2, padding="VALID",
                                dtype=dt)(x))
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


def _build_tower(m, tag: str, use_conv: bool):
    """Instantiate one tower's submodules (names shared with the step-wise
    ConvLSTMPolicy so both modules consume the same parameter tree).
    Creation happens exactly once per trace; application may repeat (e.g.
    per time chunk in ConvLSTMPolicySeq)."""
    mods = {
        "dense": [nn.Dense(m.fc_dim, name=f"dense{i + 1}_{tag}")
                  for i in range(m.num_fc)],
        "ln": nn.LayerNorm(name=f"ln_{tag}"),
    }
    if use_conv:
        mods["embed"] = OneHotEmbed(
            m.input_emb_vocab, m.emb_dim, merge_last_axis=True,
            out_dtype=jnp.bfloat16, name=f"embedding_{tag}")
        mods["conv"] = _ConvTower(m.num_conv, name=f"conv_{tag}")
    return mods


def _apply_tower(mods, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Pre-LSTM features of one tower; obs leaves have one leading batch
    axis."""
    flat_parts = [obs["flat"]]
    if "time" in obs:
        t = obs["time"]
        flat_parts.append(t if t.ndim == 2 else t[:, None])
    if "pa" in obs:  # planner: agent-wise sub-obs [B, N, F] -> [B, N*F]
        flat_parts.append(obs["pa"].reshape(obs["pa"].shape[0], -1))
    non_conv = jnp.concatenate(flat_parts, axis=-1)

    if "conv" in mods:
        # Map obs may arrive uint8-compressed from the rollout batch
        # (trainer MAP_OBS_KEYS); the cast back is lossless.
        wm = jnp.transpose(obs["world-map"], (0, 2, 3, 1)).astype(
            jnp.bfloat16
        )  # BHWC; map values are small exact ints — bf16 is lossless here
        # idx stays in its storage dtype (u8/f32); OneHotEmbed compares
        # against a native-dtype iota, so no integer cast is needed.
        idx = obs["world-idx_map"]
        # merge_last_axis embed: [B, H, W, C_idx] -> [B, H, W, C_idx*emb]
        emb = mods["embed"](jnp.transpose(idx, (0, 2, 3, 1)))
        conv_in = jnp.concatenate([wm, emb], axis=-1)
        conv_out = mods["conv"](conv_in)
        dense = jnp.concatenate([conv_out, non_conv], axis=-1)
    else:
        dense = non_conv
    for layer in mods["dense"]:
        dense = nn.relu(layer(dense))
    return mods["ln"](dense)


def _tower_features(m, obs: Dict[str, jnp.ndarray], tag: str) -> jnp.ndarray:
    """Build + apply one tower (the step-wise single-call path)."""
    return _apply_tower(_build_tower(m, tag, "world-map" in obs), obs)


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
        outs = []
        new_carries = []
        for tag, cr in (("pol", pol_carry), ("val", val_carry)):
            dense = _tower_features(self, obs, tag)
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


class ConvLSTMPolicySeq(nn.Module):
    """Time-parallel twin of ConvLSTMPolicy for whole-sequence consumers.

    Same parameter tree as ConvLSTMPolicy (shared _tower_features + matching
    lstm/head names), but consumes obs sequences [T, B, ...]: the conv/FC/LN
    torso and the output heads run ONCE over the folded [T*B] batch —
    MXU-sized matmuls instead of T tiny per-step launches — and only the
    LSTM cells scan over time on [B, cell_size] features. This is the
    TPU-shaped layout for the PPO update, where the whole rollout window is
    available at once; the step-wise module remains the acting path.

    Returns (logits [T,B,A], value [T,B], final carry).
    """

    num_actions: int
    input_emb_vocab: int = 100
    emb_dim: int = 4
    num_conv: int = 2
    num_fc: int = 2
    fc_dim: int = 128
    cell_size: int = 128

    # Target folded-batch size for one torso launch. Bounds peak HBM: the
    # torso's conv-boundary intermediates are materialized per chunk only
    # (the chunk scan is rematerialized), while each chunk stays MXU-sized.
    torso_batch_target: int = 65536

    def _chunk_steps(self, T: int, B: int) -> int:
        """Largest divisor d of T with d*B <= torso_batch_target (min 1)."""
        best = 1
        for d in range(1, T + 1):
            if T % d == 0 and d * B <= self.torso_batch_target:
                best = d
        return best

    @nn.compact
    def __call__(self, obs_seq: Dict[str, jnp.ndarray], carry):
        T, B = obs_seq["flat"].shape[:2]

        # Fold BATCH-major: [T, B, ...] -> [B, T, ...] -> [B*T, ...].
        # B is the sharded (env x agent) axis under a device mesh; merging
        # it as the MAJOR dim keeps the merged axis sharded, whereas a
        # [T*B] time-major fold makes GSPMD all-gather the whole rollout
        # batch across hosts (caught by tools/collective_audit.py).
        obs_bt = {k: jnp.swapaxes(v, 0, 1) for k, v in obs_seq.items()}

        chunk = self._chunk_steps(T, B)
        if chunk == T:
            obs_f = {
                k: v.reshape((B * T,) + v.shape[2:])
                for k, v in obs_bt.items()
            }
            f_p = _tower_features(self, obs_f, "pol").reshape(B, T, -1)
            f_v = _tower_features(self, obs_f, "val").reshape(B, T, -1)
        else:
            # Chunked torso (chunks slice the replicated T axis): the
            # dominant transient (the folded conv-boundary copies) is
            # bounded to one chunk's worth. NOTE: nn.remat around the chunk
            # reliably crashes the TPU compiler's memory-space assignment
            # (ConsumeResource check failure); the chunks run unremat'd —
            # the true backward residuals per sample are small.
            nchunks = T // chunk
            use_conv = "world-map" in obs_seq
            mods_p = _build_tower(self, "pol", use_conv)
            mods_v = _build_tower(self, "val", use_conv)
            fps, fvs = [], []
            for c in range(nchunks):
                obs_ch = {
                    k: v[:, c * chunk:(c + 1) * chunk].reshape(
                        (B * chunk,) + v.shape[2:])
                    for k, v in obs_bt.items()
                }
                fps.append(_apply_tower(mods_p, obs_ch).reshape(B, chunk, -1))
                fvs.append(_apply_tower(mods_v, obs_ch).reshape(B, chunk, -1))
            f_p = jnp.concatenate(fps, axis=1)
            f_v = jnp.concatenate(fvs, axis=1)

        f_p = jnp.swapaxes(f_p, 0, 1)  # [T, B, F]
        f_v = jnp.swapaxes(f_v, 0, 1)

        def cell_step(m, carry, xs):
            (pc, vc) = carry
            fp_t, fv_t = xs
            pc, out_p = nn.OptimizedLSTMCell(m.cell_size, name="lstm_pol")(
                pc, fp_t)
            vc, out_v = nn.OptimizedLSTMCell(m.cell_size, name="lstm_val")(
                vc, fv_t)
            return (pc, vc), (out_p, out_v)

        scan = nn.scan(
            cell_step, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=0, out_axes=0,
        )
        carry, (out_p, out_v) = scan(self, carry, (f_p, f_v))

        # Heads contract the feature (last) axis of [T, B, F] directly — no
        # fold, so no resharding of the batch axis.
        logits = nn.Dense(self.num_actions, name="head_pol")(out_p)
        logits = apply_logit_mask(logits, obs_seq.get("action_mask"))
        value = nn.Dense(1, name="head_val")(out_v)[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int):
        zeros = jnp.zeros((batch_size, self.cell_size), jnp.float32)
        return ((zeros, zeros), (zeros, zeros))


_CONV_LSTM_FIELDS = ("num_actions", "input_emb_vocab", "emb_dim", "num_conv",
                     "num_fc", "fc_dim", "cell_size")


def sequence_twin(model):
    """The whole-sequence twin of a step-wise policy, or None.

    ConvLSTMPolicy -> ConvLSTMPolicySeq with the same config (and the same
    parameter tree). Carry-less models need no twin: consumers fold time
    into the batch axis directly.
    """
    if isinstance(model, ConvLSTMPolicy):
        return ConvLSTMPolicySeq(**{f: getattr(model, f)
                                    for f in _CONV_LSTM_FIELDS})
    return None


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
