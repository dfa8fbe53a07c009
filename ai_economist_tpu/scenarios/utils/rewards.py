"""Reward / social-welfare functions as jittable jnp ops.

Parity target: ai_economist/foundation/scenarios/utils/rewards.py:12-133.
"""

from __future__ import annotations

import jax.numpy as jnp

from ai_economist_tpu.scenarios.utils import social_metrics


def isoelastic_coin_minus_labor(
    coin_endowment, total_labor, isoelastic_eta, labor_coefficient
):
    """Concave-in-coin utility minus linear labor cost (rewards.py:12-48)."""
    coin = jnp.maximum(coin_endowment, 0.0)
    if isoelastic_eta == 1.0:
        util_c = jnp.log(jnp.maximum(1.0, coin))
    else:
        util_c = (coin ** (1.0 - isoelastic_eta) - 1.0) / (1.0 - isoelastic_eta)
    return util_c - total_labor * labor_coefficient


def coin_minus_labor_cost(
    coin_endowment, total_labor, labor_exponent, labor_coefficient
):
    """Linear-in-coin utility minus power-law labor cost (rewards.py:51-81)."""
    return coin_endowment - (total_labor ** labor_exponent) * labor_coefficient


def coin_eq_times_productivity(coin_endowments, equality_weight):
    """Per-capita productivity scaled by (weighted) equality
    (rewards.py:84-101)."""
    n_agents = coin_endowments.shape[0]
    prod = social_metrics.get_productivity(coin_endowments) / n_agents
    eq = equality_weight * social_metrics.get_equality(coin_endowments) + (
        1.0 - equality_weight
    )
    return eq * prod


def inv_income_weighted_coin_endowments(coin_endowments):
    """Inverse-income-weighted average endowment (rewards.py:104-116)."""
    w = 1.0 / jnp.maximum(coin_endowments, 1.0)
    w = w / jnp.sum(w)
    return jnp.sum(coin_endowments * w)


def inv_income_weighted_utility(coin_endowments, utilities):
    """Inverse-income-weighted average utility (rewards.py:119-133)."""
    w = 1.0 / jnp.maximum(coin_endowments, 1.0)
    w = w / jnp.sum(w)
    return jnp.sum(utilities * w)
