"""Gym-style space objects + obs-dict -> space synthesis.

TPU-native analog of the reference's space synthesis
(ai_economist/foundation/env_wrapper.py:41-81 `recursive_obs_dict_to_spaces_dict`
and tutorials/rllib/env_wrapper.py:74-101 action-space construction). When
`gymnasium` or `gym` is importable we use its classes so external RL libraries
get genuine gym spaces; otherwise the minimal API-compatible fallbacks below
(shape/dtype/low/high/n/nvec/sample/contains) are used — enough for RLlib-style
space introspection without adding a gym dependency.
"""

from __future__ import annotations

import numpy as np

BIG_NUMBER = 1e20

try:  # pragma: no cover - depends on environment
    from gymnasium import spaces as _gym_spaces
except ImportError:  # pragma: no cover
    try:
        from gym import spaces as _gym_spaces
    except ImportError:
        _gym_spaces = None


class Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        self.low = np.full(shape, low, dtype) if np.isscalar(low) else np.asarray(low, dtype)
        self.high = np.full(shape, high, dtype) if np.isscalar(high) else np.asarray(high, dtype)
        self.shape = tuple(shape) if shape is not None else self.low.shape
        self.dtype = np.dtype(dtype)

    def sample(self, rng=None):
        rng = rng or np.random
        lo = np.maximum(self.low, -1e6)
        hi = np.minimum(self.high, 1e6)
        return rng.uniform(lo, hi).astype(self.dtype)

    def contains(self, x):
        x = np.asarray(x)
        return x.shape == self.shape and bool((x >= self.low).all() and (x <= self.high).all())

    def __repr__(self):
        return f"Box{self.shape}"


class Discrete:
    def __init__(self, n):
        self.n = int(n)
        self.shape = ()
        self.dtype = np.int64

    def sample(self, rng=None):
        rng = rng or np.random
        return int(rng.randint(self.n)) if hasattr(rng, "randint") else int(rng.integers(self.n))

    def contains(self, x):
        return 0 <= int(x) < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


class MultiDiscrete:
    def __init__(self, nvec):
        self.nvec = np.asarray(nvec, np.int64)
        self.shape = self.nvec.shape
        self.dtype = np.int64

    def sample(self, rng=None):
        rng = rng or np.random
        f = rng.randint if hasattr(rng, "randint") else rng.integers
        return np.array([f(n) for n in self.nvec], np.int64)

    def contains(self, x):
        x = np.asarray(x)
        return x.shape == self.shape and bool(((x >= 0) & (x < self.nvec)).all())

    def __repr__(self):
        return f"MultiDiscrete({self.nvec.tolist()})"


class Dict:
    def __init__(self, spaces_dict):
        self.spaces = dict(spaces_dict)
        self.shape = None

    def __getitem__(self, k):
        return self.spaces[k]

    def keys(self):
        return self.spaces.keys()

    def items(self):
        return self.spaces.items()

    def sample(self, rng=None):
        return {k: v.sample(rng) for k, v in self.spaces.items()}

    def contains(self, x):
        return all(k in x and v.contains(x[k]) for k, v in self.spaces.items())

    def __repr__(self):
        return f"Dict({list(self.spaces)})"


if _gym_spaces is not None:  # pragma: no cover
    Box_impl, Discrete_impl = _gym_spaces.Box, _gym_spaces.Discrete
    MultiDiscrete_impl, Dict_impl = _gym_spaces.MultiDiscrete, _gym_spaces.Dict
else:
    Box_impl, Discrete_impl, MultiDiscrete_impl, Dict_impl = (
        Box, Discrete, MultiDiscrete, Dict,
    )


def obs_dict_to_spaces(obs):
    """Recursively synthesize a Dict space from one observation sample
    (reference env_wrapper.py:41-81). Box bounds use the reference's
    overflow-halving loop semantics, collapsed analytically: the largest
    finite +/-x representable in the array dtype."""
    assert isinstance(obs, dict)
    out = {}
    for k, v in obs.items():
        if isinstance(v, dict):
            out[k] = obs_dict_to_spaces(v)
            continue
        arr = np.asarray(v)
        if arr.ndim == 0:
            arr = arr[None]
        x = BIG_NUMBER
        if np.issubdtype(arr.dtype, np.integer):
            x = float(np.iinfo(arr.dtype).max // 2)
        elif np.issubdtype(arr.dtype, np.floating):
            x = min(x, float(np.finfo(arr.dtype).max) / 2)
        out[k] = Box_impl(low=-x, high=x, shape=arr.shape, dtype=arr.dtype)
    return Dict_impl(out)


def action_space_from_layout(layout):
    """Discrete (single-action mode) or MultiDiscrete (multi mode) from an
    ActionLayout (reference tutorials/rllib/env_wrapper.py:78-101)."""
    if layout.multi_action_mode:
        return MultiDiscrete_impl(np.asarray(layout.action_dims, np.int64))
    return Discrete_impl(int(layout.total_actions))
