"""Tax-annealing curriculum helpers.

Parity target: ai_economist/foundation/components/utils.py:10-115.
"""

from __future__ import annotations

import jax.numpy as jnp


def annealed_tax_limit(completions, warmup_period, slope, final_max_tax_value=1.0):
    """Maximum tax rate at this stage of annealing (components/utils.py:10-57)."""
    visible = jnp.clip(slope * (completions - warmup_period), 0.0, 1.0)
    return visible * final_max_tax_value


def annealed_tax_mask(completions, warmup_period, slope, tax_values):
    """Binary mask over tax values given annealing progress
    (components/utils.py:60-115)."""
    tax_values = jnp.asarray(tax_values)
    abs_tax = jnp.abs(tax_values)
    full = jnp.max(abs_tax)
    max_visible = annealed_tax_limit(completions, warmup_period, slope, full)
    return (abs_tax <= max_visible).astype(jnp.float32)
