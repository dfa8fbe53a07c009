"""Social metrics: Gini / equality / productivity, as jittable jnp ops.

Parity target: ai_economist/foundation/scenarios/utils/social_metrics.py:10-75.
The reference switches between an exact O(n^2) Gini for n < 30 and a
sorted-cumsum approximation above; we keep the same crossover so numbers match
at every population size.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_gini(endowments: jnp.ndarray) -> jnp.ndarray:
    n = endowments.shape[0]
    if n < 30:
        diff = jnp.abs(endowments[:, None] - endowments[None, :]).sum()
        norm = 2.0 * n * endowments.sum()
        unscaled = diff / (norm + 1e-10)
        return unscaled / ((n - 1) / n)
    s = jnp.sort(endowments)
    return 1.0 - (2.0 / (n + 1)) * jnp.sum(jnp.cumsum(s) / (jnp.sum(s) + 1e-10))


def get_equality(endowments: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - get_gini(endowments)


def get_productivity(coin_endowments: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(coin_endowments)
