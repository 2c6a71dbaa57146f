"""Pallas TPU kernel: one fused CBCA aggregation round.

One kernel program computes a (TH, TW, TD) output tile of
``aggregate(vol) / region_size`` by staging a haloed input block in VMEM
and applying both separable arm stencils (horizontal, then vertical over
the horizontal sums) without touching HBM in between. The pure-XLA
stencil in mccnn_tpu.ops.cbca materializes the (H, W, D) horizontal-sum
intermediate in HBM every round; at 18+ rounds per volume pair that
intermediate traffic dominates the whole matching pipeline, which is why
this is one of the framework's hand-written kernels.

The spatial halo is 16 (>= the 13-offset stencil radius) because HBM DMA
slice offsets/sizes must align to the (8, 128) f32 tiling on the two
minor dims.

Semantics are identical to ``cbca.cbca`` (and therefore to the reference's
region averaging, reference: src/process_functional.py:146-182): tested
against the same oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum

_HALO = 16  # >= radius (13), aligned to the sublane tile (8)


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _iteration_kernel(
    vol_hbm,      # (H + 2*HALO, W + 2*HALO, D) f32, zero halo, ANY/HBM
    arm_l_hbm,    # (H + 2*HALO, W) int32, zero halo rows, ANY/HBM
    arm_r_hbm,
    arm_u_ref,    # (TH, TW) int32 blocks
    arm_d_ref,
    inv_ref,      # (TH, TW) f32 block
    out_ref,      # (TH, TW, TD) f32 block
    vol_vmem,     # scratch: (TH + 2*HALO, TW + 2*HALO, TD) f32
    mid_ref,      # scratch: (TH + 2*HALO, TW, TD) f32 (horizontal sums)
    arm_l_vmem,   # scratch: (TH + 2*HALO, TW) int32 (row-haloed)
    arm_r_vmem,
    dma_sems,
    *,
    radius: int,
    tile_h: int,
    tile_w: int,
    tile_d: int,
):
    import math

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    halo = _HALO
    # alignment hints (true by construction: tile sizes are tiling-aligned)
    row0 = pl.multiple_of(i * tile_h, math.gcd(tile_h, 8))
    col0 = pl.multiple_of(j * tile_w, math.gcd(tile_w, 128))
    lane0 = pl.multiple_of(k * tile_d, math.gcd(tile_d, 128))

    copies = [
        pltpu.make_async_copy(
            vol_hbm.at[
                pl.ds(row0, tile_h + 2 * halo),
                pl.ds(col0, tile_w + 2 * halo),
                pl.ds(lane0, tile_d),
            ],
            vol_vmem,
            dma_sems.at[0],
        ),
        pltpu.make_async_copy(
            arm_l_hbm.at[pl.ds(row0, tile_h + 2 * halo), pl.ds(col0, tile_w)],
            arm_l_vmem,
            dma_sems.at[1],
        ),
        pltpu.make_async_copy(
            arm_r_hbm.at[pl.ds(row0, tile_h + 2 * halo), pl.ds(col0, tile_w)],
            arm_r_vmem,
            dma_sems.at[2],
        ),
    ]
    for copy in copies:
        copy.start()
    for copy in copies:
        copy.wait()

    def gate(arm_plane, offset):
        # 0/1 f32 multiply — Mosaic can't insert a minor dim on i1 vectors
        return (arm_plane >= offset).astype(out_ref.dtype)[:, :, None]

    # Both stencils accumulate through VMEM scratch refs inside fori_loops:
    # an unrolled 2*13-term chain makes Mosaic materialize every statement's
    # temporary on the VMEM stack (measured 42-66 MB, far over the 16 MB
    # budget); the loop body keeps one temporary live.
    mid_ref[:, :, :] = vol_vmem[:, halo: halo + tile_w, :]

    def horiz_body(offset, _):
        right = vol_vmem[:, pl.ds(halo + offset, tile_w), :]
        mid_ref[:, :, :] = mid_ref[:, :, :] + gate(arm_r_vmem[:, :], offset) * right
        left = vol_vmem[:, pl.ds(halo - offset, tile_w), :]
        mid_ref[:, :, :] = mid_ref[:, :, :] + gate(arm_l_vmem[:, :], offset) * left
        return _

    jax.lax.fori_loop(1, radius + 1, horiz_body, None)

    # vertical arm stencil over the horizontal sums
    out_ref[:, :, :] = mid_ref[halo: halo + tile_h, :, :]

    def vert_body(offset, _):
        down = mid_ref[pl.ds(halo + offset, tile_h), :, :]
        out_ref[:, :, :] = out_ref[:, :, :] + gate(arm_d_ref[:, :], offset) * down
        up = mid_ref[pl.ds(halo - offset, tile_h), :, :]
        out_ref[:, :, :] = out_ref[:, :, :] + gate(arm_u_ref[:, :], offset) * up
        return _

    jax.lax.fori_loop(1, radius + 1, vert_body, None)

    out_ref[:, :, :] = out_ref[:, :, :] * inv_ref[:, :][:, :, None]


def cbca_pallas(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int = 16,
    tile_w: int = 128,
    tile_d: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` backed by the fused kernel."""
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    radius = distance_threshold - 1
    if radius > _HALO:
        raise ValueError(
            f"distance_threshold {distance_threshold} exceeds the kernel halo "
            f"({_HALO}); use the XLA path for larger crosses"
        )
    height, width, d_pad = volume.shape
    pad_h = _round_up(height, tile_h) - height
    pad_w = _round_up(width, tile_w) - width
    pad_d = _round_up(d_pad, tile_d) - d_pad
    hp, wp, dp = height + pad_h, width + pad_w, d_pad + pad_d

    # arms in the tile padding are 0 => padded pixels aggregate only
    # themselves and never contaminate real pixels (arms are border-capped,
    # so no real pixel's arm reaches into the padding)
    def pad2(plane):
        return jnp.pad(plane, ((0, pad_h), (0, pad_w)))

    arm_l = pad2(arms.left)
    arm_r = pad2(arms.right)
    arm_u = pad2(arms.up)
    arm_d = pad2(arms.down)

    h_count = (arm_l + arm_r + 1).astype(jnp.float32)
    region_size = _arm_stencil_sum(h_count, arm_u, arm_d, axis=0,
                                   distance_threshold=distance_threshold)
    inv_region = 1.0 / region_size

    # horizontal arms also needed at row-halo rows
    arm_l_haloed = jnp.pad(arm_l, ((_HALO, _HALO), (0, 0)))
    arm_r_haloed = jnp.pad(arm_r, ((_HALO, _HALO), (0, 0)))

    grid = (hp // tile_h, wp // tile_w, dp // tile_d)
    kernel = functools.partial(
        _iteration_kernel,
        radius=radius,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_d=tile_d,
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # haloed volume, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # haloed arms, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w, tile_d),
                               lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, dp), volume.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, tile_w + 2 * _HALO, tile_d),
                       volume.dtype),
            pltpu.VMEM((tile_h + 2 * _HALO, tile_w, tile_d), volume.dtype),
            pltpu.VMEM((tile_h + 2 * _HALO, tile_w), jnp.int32),
            pltpu.VMEM((tile_h + 2 * _HALO, tile_w), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    def one_round(_, vol):
        vol_haloed = jnp.pad(
            vol,
            ((_HALO, _HALO + pad_h), (_HALO, _HALO + pad_w), (0, pad_d)),
        )
        out = call(
            vol_haloed, arm_l_haloed, arm_r_haloed, arm_u, arm_d, inv_region
        )
        return out[:height, :width, :d_pad]

    return lax.fori_loop(0, num_iterations, one_round, volume)
