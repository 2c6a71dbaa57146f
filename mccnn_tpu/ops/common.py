"""Shared helpers for the stereo op library.

Canonical volume layout is ``(H, W, D)`` — disparity in the minor (lane)
dimension, padded up to a multiple of 128 so tiles map cleanly onto the
TPU's (8,128) vregs and reductions over disparity are lane reductions.
Padded disparity entries hold the ``BIG_COST`` sentinel, which makes WTA
argmin, SGM's d±1 boundary terms, and min-over-d reductions correct with
zero masking.

(The reference keeps volumes as ``(ndisp, H, W)`` NumPy arrays,
reference: src/process_functional.py:82; the layouts are converted only at
test oracles and API edges.)
"""

from __future__ import annotations

import jax.numpy as jnp

LANE = 128

# Cost stored in padded disparity lanes. Large but finite: +inf would poison
# CBCA's cumulative-sum differences (inf - inf = NaN) and NaN poisons argmin.
# BIG_COST survives means (mean(BIG..BIG) = BIG), never wins a min against a
# real cost, and implements SGM's d+-1 boundary terms (the reference simply
# omits the out-of-range terms, reference: src/process_functional.py:547-566).
BIG_COST = 1e9


def pad_disparities(ndisp: int, multiple: int = LANE) -> int:
    """Round ndisp up to a lane multiple (the padded volume depth)."""
    return -(-ndisp // multiple) * multiple


def disparity_iota(d_pad: int) -> jnp.ndarray:
    """(1, 1, d_pad) iota over the disparity axis."""
    return jnp.arange(d_pad, dtype=jnp.int32)[None, None, :]


def column_iota(width: int) -> jnp.ndarray:
    """(1, width, 1) iota over the column axis."""
    return jnp.arange(width, dtype=jnp.int32)[None, :, None]
