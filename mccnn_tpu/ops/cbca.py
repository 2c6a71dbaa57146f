"""Cross-based cost aggregation (CBCA).

Behavioral spec (reference: src/process_functional.py:117-183,571-657):
  * Each pixel grows 4 arms (up/down/left/right), extending while the
    endpoint's intensity stays within ``intensity_threshold`` of the center
    and the offset stays under ``distance_threshold`` (self always included).
  * The support region of p is the union, over pixels v on p's *vertical*
    arm, of v's *horizontal* arm.
  * Aggregation replaces each disparity fiber with the mean over the support
    region, repeated ``max_average_time`` times (with the regions fixed).

TPU design: the data-dependent variable-length regions become arm-length
maps (4 small int32 planes, built with a static cumulative-AND loop over the
<= 13 offsets), and each aggregation round is two separable masked-stencil
passes — a horizontal arm-sum (sum of <= 2*dist-1 shifted volume slices,
each gated by an arm-length comparison plane), then the same vertically
over those sums. The shifted reads are static slices of one padded buffer,
so XLA fuses the whole stencil into a single streaming pass over the
volume (measured ~15x faster on TPU than a cumsum+gather formulation —
TPU gathers are slow, slices fuse). The region-size normalizer is
disparity-independent and computed once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CrossArms(NamedTuple):
    """Arm extents per pixel (int32 maps, self excluded)."""

    up: jax.Array
    down: jax.Array
    left: jax.Array
    right: jax.Array


def compute_arms(
    image: jax.Array, intensity_threshold: float, distance_threshold: int
) -> CrossArms:
    """Grow the 4 support arms of every pixel.

    ``image`` is the (H, W) standardized grayscale image; the intensity test
    is ``|I(p) - I(q)| < tau`` on the *endpoint* q, and arms are capped at
    ``distance_threshold - 1`` offsets (the reference stores at most
    ``distance_threshold`` pixels per half-arm including self,
    reference: src/process_functional.py:580-629).
    """

    def arm(shift_axis: int, sign: int) -> jax.Array:
        length = jnp.zeros(image.shape, dtype=jnp.int32)
        alive = jnp.ones(image.shape, dtype=bool)
        size = image.shape[shift_axis]
        coords = jnp.arange(size, dtype=jnp.int32)
        coords = coords[:, None] if shift_axis == 0 else coords[None, :]
        for offset in range(1, distance_threshold):
            neighbor = jnp.roll(image, sign * offset, axis=shift_axis)
            if sign > 0:  # neighbor at coord - offset (up / left)
                in_bounds = coords - offset >= 0
            else:  # neighbor at coord + offset (down / right)
                in_bounds = coords + offset < size
            alive = alive & in_bounds & (jnp.abs(image - neighbor) < intensity_threshold)
            length = length + alive.astype(jnp.int32)
        return length

    return CrossArms(
        up=arm(0, +1), down=arm(0, -1), left=arm(1, +1), right=arm(1, -1)
    )


def _arm_stencil_sum(
    volume: jax.Array,
    neg_arm: jax.Array,
    pos_arm: jax.Array,
    axis: int,
    distance_threshold: int,
) -> jax.Array:
    """sum_{o in [-neg_arm(p), +pos_arm(p)]} volume[p + o*axis] per pixel.

    The shifted reads are static slices of one padded buffer, gated by
    (arm >= |o|) planes; arm lengths are border-capped by construction so
    the zero padding never leaks in.
    """
    radius = distance_threshold - 1
    pad_spec = [(0, 0)] * volume.ndim
    pad_spec[axis] = (radius, radius)
    padded = jnp.pad(volume, pad_spec)
    size = volume.shape[axis]

    def shifted(offset):
        return lax.slice_in_dim(padded, radius + offset, radius + offset + size,
                                axis=axis)

    def gate(plane):
        return plane[..., None] if volume.ndim == 3 else plane

    acc = volume  # offset 0: always in the arm
    for offset in range(1, distance_threshold):
        acc = acc + jnp.where(gate(pos_arm >= offset), shifted(+offset), 0.0)
        acc = acc + jnp.where(gate(neg_arm >= offset), shifted(-offset), 0.0)
    return acc


def cbca(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
) -> jax.Array:
    """Aggregate a (H, W, D) cost volume over cross support regions.

    Each round: HS(h, w) = sum of cost over the horizontal arm of (h, w);
    out(p) = sum of HS over the vertical arm of p, divided by the region
    size. Matches the reference's region semantics exactly — the horizontal
    arms used are those of the pixels on p's vertical arm, at p's column
    (reference: src/process_functional.py:640-656).
    """
    if num_iterations == 0:
        return volume

    # region size: sum of horizontal-arm lengths over the vertical arm
    h_count = (arms.left + arms.right + 1).astype(jnp.float32)
    region_size = _arm_stencil_sum(
        h_count, arms.up, arms.down, axis=0, distance_threshold=distance_threshold
    )
    inv_region = (1.0 / region_size)[..., None]

    def one_round(_, vol):
        # accumulate in f32 regardless of the storage dtype; each round's
        # result is cast back to storage, matching the fused kernel's
        # bf16-volume convention (storage bf16, accumulation f32)
        horiz = _arm_stencil_sum(
            vol.astype(jnp.float32), arms.left, arms.right, axis=1,
            distance_threshold=distance_threshold,
        )
        aggregated = _arm_stencil_sum(
            horiz, arms.up, arms.down, axis=0,
            distance_threshold=distance_threshold,
        )
        return (aggregated * inv_region).astype(vol.dtype)

    return lax.fori_loop(0, num_iterations, one_round, volume)
