"""Left-right consistency check and disparity interpolation.

Behavioral spec (reference: src/process_functional.py:279-378). Each pixel is
classified:
  * occlusion (2) if it has no correspondence (``w < dL``) or no disparity
    explains it;
  * match (0) if ``|dL(p) - dR(p - dL)| <= 1``;
  * mismatch (1) if some other disparity d has ``|d - dR(p - d)| <= 1``.
Fills: mismatch -> median of the nearest *match* pixels found in the 4 axis
directions (the paper uses 16 directions; the reference uses 4,
reference comment at :318); occlusion -> nearest match strictly to the right
(the paper extends left; the reference goes right, comment at :361); pixels
with no found neighbor keep their raw value.

TPU design: the per-pixel directional searches are index propagation —
``lax.cummax``/``cummin`` over match positions followed by one gather of the
disparity at the found index. (An earlier ``lax.associative_scan``
formulation was semantically identical but made the XLA TPU compiler hang
for >45 min at full-res (2000x3008) when several scans share inputs in one
program; the cumulative-op form compiles in seconds and is also faster.)
The mismatch existence test is a 3-scatter reprojection over the disparity
axis. No data-dependent loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _nearest_strict(values, seen, axis: int, toward_end: bool):
    """Nearest seen value strictly beyond each position along a direction.

    ``toward_end=True`` searches toward increasing index (right/down).
    Returns (vals, flags): the value of ``values`` at the nearest position
    with ``seen=True`` strictly beyond each position, and whether one exists.
    """
    size = values.shape[axis]
    iota = lax.broadcasted_iota(jnp.int32, values.shape, axis)
    if toward_end:
        # nearest seen at-or-after each position, then look one past self
        idx = jnp.where(seen, iota, size)  # sentinel `size` = none
        nearest = lax.cummin(idx, axis=axis, reverse=True)
        nearest = jnp.roll(nearest, -1, axis=axis)
        flags = (nearest < size) & (iota < size - 1)
    else:
        idx = jnp.where(seen, iota, -1)  # sentinel -1 = none
        nearest = lax.cummax(idx, axis=axis)
        nearest = jnp.roll(nearest, 1, axis=axis)
        flags = (nearest >= 0) & (iota > 0)
    safe = jnp.clip(nearest, 0, size - 1)
    vals = jnp.take_along_axis(values, safe, axis=axis)
    return vals, flags


def classify(
    left_disparity: jax.Array, right_disparity: jax.Array, ndisp: int
) -> jax.Array:
    """(H, W) int32 status map: 0 = match, 1 = mismatch, 2 = occlusion.

    Inputs are WTA disparity maps, which are integer-valued (the reference
    calls this stage before any subpixel refinement; the mismatch
    reprojection below relies on that integrality).
    """
    height, width = left_disparity.shape
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    d_left = left_disparity.astype(jnp.int32)

    no_correspondence = cols < d_left
    src = jnp.clip(cols - d_left, 0, width - 1)
    d_right_at = jnp.take_along_axis(right_disparity, src, axis=1)
    match = (~no_correspondence) & (
        jnp.abs(d_left.astype(jnp.float32) - d_right_at) <= 1.0
    )

    # exists d in [0, min(w+1, ndisp)) with |d - dR(h, w-d)| <= 1 ?
    # Reprojection scatter instead of an O(ndisp) roll loop: with
    # integer-valued dR (WTA output), |d - dR(w')| <= 1 at w' = w - d means
    # d in {dR(w')-1, dR(w'), dR(w')+1}, i.e. column w' "explains" exactly
    # the columns w = w' + dR(w') + delta, delta in {-1, 0, +1}, subject to
    # 0 <= dR+delta < ndisp (and w' >= 0, automatic). Three scatters mark
    # all explained columns — O(H*W) total instead of O(H*W*ndisp).
    dr_int = right_disparity.astype(jnp.int32)
    rows2 = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.int32)[:, None], (height, width)
    )
    mismatch_marks = jnp.zeros((height, width), dtype=jnp.int32)
    for delta in (-1, 0, 1):
        d_cand = dr_int + delta
        valid = (d_cand >= 0) & (d_cand < ndisp)
        target = jnp.where(valid, cols + d_cand, width)  # width => dropped
        mismatch_marks = mismatch_marks.at[rows2, target].max(
            valid.astype(jnp.int32), mode="drop"
        )
    mismatch = mismatch_marks.astype(bool)

    return jnp.where(
        no_correspondence,
        2,
        jnp.where(match, 0, jnp.where(mismatch, 1, 2)),
    ).astype(jnp.int32)


def interpolate(
    left_disparity: jax.Array, status: jax.Array
) -> jax.Array:
    """Fill mismatches/occlusions from nearest match pixels (see module doc)."""
    is_match = status == 0

    right_v, right_f = _nearest_strict(left_disparity, is_match, 1, toward_end=True)
    left_v, left_f = _nearest_strict(left_disparity, is_match, 1, toward_end=False)
    down_v, down_f = _nearest_strict(left_disparity, is_match, 0, toward_end=True)
    up_v, up_f = _nearest_strict(left_disparity, is_match, 0, toward_end=False)

    vals = jnp.stack([right_v, left_v, down_v, up_v], axis=-1)
    flags = jnp.stack([right_f, left_f, down_f, up_f], axis=-1)
    count = jnp.sum(flags, axis=-1)
    ordered = jnp.sort(jnp.where(flags, vals, jnp.inf), axis=-1)
    lo = jnp.clip((count - 1) // 2, 0, 3)
    hi = jnp.clip(count // 2, 0, 3)
    median = 0.5 * (
        jnp.take_along_axis(ordered, lo[..., None], axis=-1)[..., 0]
        + jnp.take_along_axis(ordered, hi[..., None], axis=-1)[..., 0]
    )
    mismatch_fill = jnp.where(count > 0, median, left_disparity)
    occlusion_fill = jnp.where(right_f, right_v, left_disparity)

    return jnp.where(
        status == 0,
        left_disparity,
        jnp.where(status == 1, mismatch_fill, occlusion_fill),
    )


def lr_consistency_interpolate(
    left_disparity: jax.Array, right_disparity: jax.Array, ndisp: int
) -> jax.Array:
    """Full consistency check + interpolation (reference pipeline stage)."""
    status = classify(left_disparity, right_disparity, ndisp)
    return interpolate(left_disparity, status)
