"""Winner-take-all disparity selection.

Behavioral spec (reference: src/process_functional.py:239-272): per-pixel
argmin over disparity with first-occurrence tie-breaking (the reference's
strict ``<`` scan keeps the earliest minimum; ``jnp.argmin`` does the same).
The BIG_COST disparity padding never wins, so no masking is needed — the
reference's triple Python loop becomes a single lane reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wta_disparity(volume: jax.Array) -> jax.Array:
    """(H, W, D) cost volume -> (H, W) float32 integer-valued disparities."""
    return jnp.argmin(volume, axis=-1).astype(jnp.float32)
