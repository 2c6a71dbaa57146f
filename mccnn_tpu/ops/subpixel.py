"""Subpixel disparity enhancement (parabola fit).

Behavioral spec (reference: src/process_functional.py:381-400): with
neighboring costs C- = C(d-1), C+ = C(d+1) around the (possibly fractional,
post-interpolation) disparity d,
    d* = d - (C+ - C-) / (2 * (C+ - 2C + C-)),
keeping d where the neighbors fall outside [0, ndisp). Indices are truncated
toward zero exactly like the reference's Python ``int()`` casts — including
the quirk that ``int(d-1)`` is 0 (not negative) for fractional d in (0, 1),
so such pixels ARE enhanced using C(0), C(0), C(1).

Deviation (documented): where the parabola is degenerate (denominator == 0)
the reference emits inf/NaN; we keep d instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def subpixel_enhance(
    disparity: jax.Array, left_volume: jax.Array, ndisp: int
) -> jax.Array:
    """(H, W) disparity + (H, W, D) left cost volume -> refined disparity."""
    d_pad = left_volume.shape[-1]
    # Python2 int() truncates toward zero; jnp float->int conversion matches.
    idx_minus = (disparity - 1.0).astype(jnp.int32)
    idx_center = disparity.astype(jnp.int32)
    idx_plus = (disparity + 1.0).astype(jnp.int32)
    keep = (idx_minus < 0) | (idx_plus >= ndisp)

    # Fiber samples via one-hot masked lane reductions instead of a
    # take_along_axis lane gather: gathers along the minor (lane) dim are
    # serialized on TPU (77 ms at half-res), while the three masked
    # reductions fuse into one pass over the volume (10 ms).
    iota = jnp.arange(d_pad, dtype=jnp.int32)

    def fiber(idx):
        onehot = iota[None, None, :] == jnp.clip(idx, 0, d_pad - 1)[..., None]
        return jnp.sum(jnp.where(onehot, left_volume, 0.0), axis=-1)

    c_minus = fiber(idx_minus)
    c_center = fiber(idx_center)
    c_plus = fiber(idx_plus)

    denom = 2.0 * (c_plus - 2.0 * c_center + c_minus)
    degenerate = denom == 0.0
    safe_denom = jnp.where(degenerate, 1.0, denom)
    delta = jnp.where(degenerate, 0.0, (c_plus - c_minus) / safe_denom)
    return jnp.where(keep, disparity, disparity - delta)
