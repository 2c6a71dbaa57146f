"""Pallas CBCA iteration kernel, (H, D, W) layout variant.

Same semantics as cbca_pallas.cbca_pallas, but the volume block lives in
VMEM as (rows, disparities, columns) so the horizontal stencil's
per-offset shifts are *lane* slices and the vertical stencil's are
untiled dim-0 slices — both avoid the second-minor-dim relayout copies
the (H, W, D) kernel pays for. The caller keeps the pipeline's (H, W, D)
layout; the two transposes happen once per round at the XLA level.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum

_ROW_HALO = 16   # >= radius 13, multiple of the sublane tile
_LANE_HALO = 128  # >= radius, multiple of the lane tile


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _iteration_kernel(
    vol_hbm,      # (Hp + 2*RH, Dp, Wp + 2*LH) f32, zero halo, ANY/HBM
    arm_l_hbm,    # (Hp + 2*RH, Wp) f32 0/1-encoded? -> int32 arms
    arm_r_hbm,
    arm_u_ref,    # (TH, TW) int32 block
    arm_d_ref,
    inv_ref,      # (TH, TW) f32 block
    out_ref,      # (TH, TD, TW) f32 block
    vol_vmem,     # scratch (TH + 2*RH, TD, TW + 2*LH)
    mid_ref,      # scratch (TH + 2*RH, TD, TW)
    arm_l_vmem,   # scratch (TH + 2*RH, TW)
    arm_r_vmem,
    dma_sems,
    *,
    radius: int,
    tile_h: int,
    tile_w: int,
    tile_d: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)  # w tile
    k = pl.program_id(2)  # d tile
    rh, lh = _ROW_HALO, _LANE_HALO
    row0 = pl.multiple_of(i * tile_h, math.gcd(tile_h, 8))
    col0 = pl.multiple_of(j * tile_w, math.gcd(tile_w, 128))
    lane_d0 = pl.multiple_of(k * tile_d, math.gcd(tile_d, 8))

    copies = [
        pltpu.make_async_copy(
            vol_hbm.at[
                pl.ds(row0, tile_h + 2 * rh),
                pl.ds(lane_d0, tile_d),
                pl.ds(col0, tile_w + 2 * lh),
            ],
            vol_vmem,
            dma_sems.at[0],
        ),
        pltpu.make_async_copy(
            arm_l_hbm.at[pl.ds(row0, tile_h + 2 * rh), pl.ds(col0, tile_w)],
            arm_l_vmem,
            dma_sems.at[1],
        ),
        pltpu.make_async_copy(
            arm_r_hbm.at[pl.ds(row0, tile_h + 2 * rh), pl.ds(col0, tile_w)],
            arm_r_vmem,
            dma_sems.at[2],
        ),
    ]
    for copy in copies:
        copy.start()
    for copy in copies:
        copy.wait()

    # Horizontal stencil: per row-group, load the lane window once as a
    # value and accumulate the 27 statically-shifted terms in registers
    # (static lane slices of values are funnel shifts — dynamic lane
    # offsets on refs must be 128-aligned, and RMW through a ref leaves
    # dead statement temporaries on the VMEM stack).
    row_group = 8
    for rg in range(0, tile_h + 2 * rh, row_group):
        window = vol_vmem[rg: rg + row_group, :, :]
        gates_r = arm_r_vmem[rg: rg + row_group, :]
        gates_l = arm_l_vmem[rg: rg + row_group, :]
        acc = window[:, :, lh: lh + tile_w]
        for offset in range(1, radius + 1):
            gate_r = (gates_r >= offset).astype(jnp.float32)[:, None, :]
            acc = acc + gate_r * window[:, :, lh + offset: lh + offset + tile_w]
            gate_l = (gates_l >= offset).astype(jnp.float32)[:, None, :]
            acc = acc + gate_l * window[:, :, lh - offset: lh - offset + tile_w]
        mid_ref[rg: rg + row_group, :, :] = acc

    # Vertical stencil: untiled dim-0 slices of the mid scratch.
    acc = mid_ref[rh: rh + tile_h, :, :]
    for offset in range(1, radius + 1):
        gate_d = (arm_d_ref[:, :] >= offset).astype(jnp.float32)[:, None, :]
        acc = acc + gate_d * mid_ref[rh + offset: rh + offset + tile_h, :, :]
        gate_u = (arm_u_ref[:, :] >= offset).astype(jnp.float32)[:, None, :]
        acc = acc + gate_u * mid_ref[rh - offset: rh - offset + tile_h, :, :]

    out_ref[:, :, :] = acc * inv_ref[:, :][:, None, :]


def cbca_pallas_hdw(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int = 8,
    tile_w: int = 128,
    tile_d: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` ((H, W, D) in/out)."""
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    radius = distance_threshold - 1
    if radius > min(_ROW_HALO, _LANE_HALO):
        raise ValueError("distance_threshold exceeds kernel halo")

    height, width, d_pad = volume.shape
    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    dp = _round_up(d_pad, tile_d)
    pad_h, pad_w, pad_d = hp - height, wp - width, dp - d_pad

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

    arm_l_haloed = jnp.pad(arm_l, ((_ROW_HALO, _ROW_HALO), (0, 0)))
    arm_r_haloed = jnp.pad(arm_r, ((_ROW_HALO, _ROW_HALO), (0, 0)))

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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_d, tile_w),
                               lambda i, j, k: (i, k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, dp, wp), volume.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_d,
                        tile_w + 2 * _LANE_HALO), volume.dtype),
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_d, tile_w), volume.dtype),
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_w), jnp.int32),
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_w), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    def one_round(_, vol):
        vol_t = jnp.transpose(vol, (0, 2, 1))  # (H, D, W)
        vol_haloed = jnp.pad(
            vol_t,
            ((_ROW_HALO, _ROW_HALO + pad_h), (0, pad_d),
             (_LANE_HALO, _LANE_HALO + pad_w)),
        )
        out = call(
            vol_haloed, arm_l_haloed, arm_r_haloed, arm_u, arm_d, inv_region
        )
        out = jnp.transpose(out, (0, 2, 1))[:height, :width, :d_pad]
        return out

    return lax.fori_loop(0, num_iterations, one_round, volume)
