"""Disparity refinement filters: boundary-clipped median and bilateral.

Behavioral spec:
  * Median (reference: src/process_functional.py:403-421): per pixel, the
    NumPy median of the window *clipped* at image borders — border windows
    have fewer samples, and even-sized sample sets average the two middles.
  * Bilateral (reference: src/process_functional.py:424-470 + src/util.py:45):
    weights = gaussian(spatial distance; sigma=blur_sigma) * binary intensity
    mask ``|I(q) - I(p)| < blur_threshold``, normalized weighted mean over
    the clipped window. The center always contributes, so the normalizer is
    never zero.

TPU design: both filters gather their <= k*k window samples with static
shift loops (pure vector ops, fused by XLA); the clipped-window median uses
a sort + rank-select that reproduces NumPy median semantics for any valid
sample count.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _window_stack(x: jax.Array, filter_height: int, filter_width: int):
    """Gather the window samples of every pixel.

    Returns (samples, valid): (H, W, k) arrays where k = fh*fw; invalid
    entries correspond to out-of-image window positions.
    """
    height, width = x.shape
    rows = jnp.arange(height, dtype=jnp.int32)[:, None]
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    rh = (filter_height - 1) // 2
    rw = (filter_width - 1) // 2

    samples, valids = [], []
    for dh in range(-rh, filter_height - rh):
        for dw in range(-rw, filter_width - rw):
            shifted = jnp.roll(x, (-dh, -dw), axis=(0, 1))
            valid = (
                (rows + dh >= 0)
                & (rows + dh < height)
                & (cols + dw >= 0)
                & (cols + dw < width)
            )
            samples.append(shifted)
            valids.append(valid)
    return jnp.stack(samples, axis=-1), jnp.stack(valids, axis=-1)


def median_filter(
    disparity: jax.Array, filter_height: int = 5, filter_width: int = 5
) -> jax.Array:
    """Boundary-clipped window median of a (H, W) disparity map."""
    samples, valid = _window_stack(disparity, filter_height, filter_width)
    k = samples.shape[-1]
    count = jnp.sum(valid, axis=-1)
    # Sort the k window samples along the MAJOR axis — each bitonic stage
    # is then an elementwise min/max over (H, W) planes, fully lane-
    # vectorized — and rank-select with one-hot masked sums instead of a
    # lane gather (together 58 -> 14 ms at half-res).
    stacked = jnp.moveaxis(jnp.where(valid, samples, jnp.inf), -1, 0)
    ordered = jnp.sort(stacked, axis=0)  # (k, H, W)
    lo = jnp.clip((count - 1) // 2, 0, k - 1)
    hi = jnp.clip(count // 2, 0, k - 1)
    iota = jnp.arange(k, dtype=jnp.int32)[:, None, None]
    v_lo = jnp.sum(jnp.where(iota == lo[None], ordered, 0.0), axis=0)
    v_hi = jnp.sum(jnp.where(iota == hi[None], ordered, 0.0), axis=0)
    return 0.5 * (v_lo + v_hi)


def bilateral_filter(
    image: jax.Array,
    disparity: jax.Array,
    filter_height: int = 5,
    filter_width: int = 5,
    mean: float = 0.0,
    sigma: float = 6.0,
    threshold: float = 2.0,
) -> jax.Array:
    """Gaussian-spatial x binary-intensity filtered (H, W) disparity map."""
    rh = (filter_height - 1) // 2
    rw = (filter_width - 1) // 2
    norm1 = 1.0 / (np.sqrt(2.0 * np.pi) * sigma)
    norm2 = -1.0 / (2.0 * sigma * sigma)
    offsets = [
        (dh, dw)
        for dh in range(-rh, filter_height - rh)
        for dw in range(-rw, filter_width - rw)
    ]
    gauss = np.array(
        [
            norm1 * np.exp(norm2 * ((np.sqrt(dh * dh + dw * dw) - mean) ** 2))
            for dh, dw in offsets
        ],
        dtype=np.float32,
    )

    disp_samples, valid = _window_stack(disparity, filter_height, filter_width)
    image_samples, _ = _window_stack(image, filter_height, filter_width)

    intensity_ok = jnp.abs(image_samples - image[..., None]) < threshold
    weights = jnp.where(valid & intensity_ok, gauss[None, None, :], 0.0)
    wsum = jnp.sum(weights, axis=-1)
    return jnp.sum(weights * disp_samples, axis=-1) / wsum
