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
``lax.cummax``/``cummin`` over int32 codes that pack (position, disparity)
so the disparity at the found position rides along in the scan and needs
no gather (see ``_nearest_strict``). (An earlier ``lax.associative_scan``
formulation was semantically identical but made the XLA TPU compiler hang
for >45 min at full-res (2000x3008) when several scans share inputs in one
program; the cumulative-op form compiles in seconds and is also faster.)
The mismatch existence test is a chunked scan over the disparity axis with
an incrementally-rolled right map. No data-dependent loops, gathers, or
scatters anywhere in this stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _nearest_strict(values, seen, axis: int, toward_end: bool):
    """Nearest seen value strictly beyond each position along a direction.

    ``toward_end=True`` searches toward increasing index (right/down).
    Returns (vals, flags): the value of ``values`` at the nearest position
    with ``seen=True`` strictly beyond each position, and whether one exists
    (``vals`` is 0 where no such position exists — callers gate on flags).

    ``values`` must be integer-valued (it is: this stage runs on WTA
    output, before subpixel refinement — same integrality `classify`
    relies on) and < 2^14. That lets the value ride ALONG with its index
    in one packed int32 cummax/cummin — position in the high bits, value
    in the low bits — so the "disparity at the found index" needs no
    gather at all (a per-element take_along_axis lane gather here cost
    ~60 ms at half-res; the packed form runs in the scan itself).
    """
    size = values.shape[axis]
    iota = lax.broadcasted_iota(jnp.int32, values.shape, axis)
    pack_bits = 14
    vi = values.astype(jnp.int32)
    packed = (iota << pack_bits) | vi
    if toward_end:
        # nearest seen at-or-after each position, then look one past self
        near = jnp.where(seen, packed, size << pack_bits)  # sentinel = none
        near = lax.cummin(near, axis=axis, reverse=True)
        near = jnp.roll(near, -1, axis=axis)
        flags = (near < (size << pack_bits)) & (iota < size - 1)
    else:
        near = jnp.where(seen, packed, -1)  # sentinel -1 = none
        near = lax.cummax(near, axis=axis)
        near = jnp.roll(near, 1, axis=axis)
        flags = (near >= 0) & (iota > 0)
    vals = jnp.where(flags, near & ((1 << pack_bits) - 1), 0)
    return vals.astype(values.dtype), flags


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
    # A chunked scan over d with an incrementally-rolled dR: each step
    # rolls the carried plane by `chunk` and tests `chunk` static shifts.
    # (A 3-scatter reprojection formulation was exact too but TPU scatter
    # is serialized: 43 ms vs 6 ms for this scan at half-res.)
    chunk = 8
    colsf = cols.astype(jnp.float32)

    def step(carry, d_start):
        acc, rolled = carry  # rolled = dR shifted right by d_start
        for k in range(chunk):
            d = d_start + k
            shifted = jnp.roll(rolled, k, axis=1)
            hit = (
                (jnp.abs(d.astype(jnp.float32) - shifted) <= 1.0)
                & (colsf >= d)
                & (d < ndisp)
            )
            acc = acc | hit
        return (acc, jnp.roll(rolled, chunk, axis=1)), None

    nsteps = -(-ndisp // chunk)
    starts = jnp.arange(0, nsteps * chunk, chunk, dtype=jnp.int32)
    (mismatch, _), _ = lax.scan(
        step, (jnp.zeros((height, width), bool), right_disparity), starts
    )

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
    # rank selection as one-hot masked reductions over the 4-lane stack —
    # a take_along_axis here is a per-element gather, which serializes on
    # TPU (measured ~50 ms of the lr stage at half-res for these two)
    rank = lax.broadcasted_iota(jnp.int32, ordered.shape, ordered.ndim - 1)
    pick = lambda sel: jnp.sum(  # noqa: E731
        jnp.where(rank == sel[..., None], ordered, 0.0), axis=-1
    )
    median = 0.5 * (pick(lo) + pick(hi))
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
