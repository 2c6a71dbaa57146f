"""Pallas TPU kernel: fused CBCA round with VMEM-generated masks.

One aggregation round (reference semantics: src/process_functional.py:146-182
— horizontal arm-gated sum, then vertical arm-gated sum of those sums,
divided by the region size) as a single kernel pass over the volume. It
replaces both the dense (H, W, W)+(W, H, H) HBM mask stacks of ops/cbca_mxu
(O(H*W*W) memory, ~3.8 GB/round of mask traffic at half-res — the full-res
memory wall) and the HBM round-trip of the (H, W, D) horizontal-sum
intermediate that every XLA formulation pays per round.

Both phases ride the MXU with masks generated in VMEM from the arm planes:

  * Phase 1 (horizontal): banded 0/1 masks (span_w source x TW dest
    columns) contracted as ONE row-batched dot_general. (A per-row matmul
    loop bottoms out on Mosaic's ~1.7us per-instruction floor — measured
    80 ms/round at half-res; a per-term VPU stencil is VMEM-bandwidth
    bound at 116 ms.)
  * Phase 2 (vertical): a column-batched dot_general contracting the
    span_h window rows, with the vertical mask generated directly in
    (w, m, t) layout and mid transposed once in VMEM. The dot always
    computes f32 (its flops are tiny — K = span_h — the result is exact,
    and the bf16 version of the same dot hangs the Mosaic compiler).
    Replacing the VPU read-modify-write stencil here took the f32 round
    66.5 -> 45.8 ms (half-res) and the bf16 full-res round 328 -> 172 ms.

Border handling needs NO data canonicalization: the haloed read window is
DMA'd with *clamped* bases (no padded volume copies per round), and the
clamp offsets (row_off / col_off, each in {0, HALO, 2*HALO}) are folded
into the mask arithmetic — mask[m, a, b] tests (a - b - col_off) against
the horizontal arms and vmask[w, m, t] tests (m - t - row_off) against the
vertical ones. The border-capped arms (arm_up[h] <= h etc.) guarantee every
gated source lies inside the clamped window, so no out-of-window value is
ever touched. (An earlier version physically rolled the window into a
canonical layout first — two full-window VMEM copies per block plus two
scratch buffers, all dead weight.)

bfloat16 volumes are the full-resolution memory mode: storage bf16,
phase-1 multiplies bf16, all accumulation f32 — strictly tighter numerics
than ops/cbca_mxu, which also quantizes the horizontal sums to bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum, cbca

_HALO = 16  # >= stencil radius (13); multiple of 8 and 16 for DMA alignment


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _round_kernel(
    vol_hbm,     # (H_r, W_r, D_r) volume, ANY/HBM (manual clamped DMA)
    arml_hbm,    # (H_r, W_r) int32 left-arm plane, ANY/HBM
    armr_hbm,
    armu_ref,    # (TH, TW) int32 block (up arms at the out tile)
    armd_ref,
    inv_ref,     # (TH, TW) f32 block (1 / region size)
    out_ref,     # (TH, TW, TD) block
    win_ref,     # scratch (TH + 2*HALO, TW + 2*HALO, TD), volume dtype
    mid_ref,     # scratch (TH + 2*HALO, TW, TD) f32 horizontal sums
    arml_vmem,   # scratch (TH + 2*HALO, TW) int32 (DMA'd, window rows)
    armr_vmem,
    dma_sems,
    *,
    radius: int,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    rows_total: int,
    cols_total: int,
):
    halo = _HALO
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    span_h = tile_h + 2 * halo
    span_w = tile_w + 2 * halo

    # Clamp the haloed read window into the array. The clamped bases stay
    # 16-aligned (tile sizes and HALO are multiples of 16), which Mosaic
    # needs to prove for the W (second-minor) volume DMA offset and the
    # row (sublane) offset of the 2D arm-plane slices.
    row_base = pl.multiple_of(
        jnp.minimum(jnp.maximum(i * tile_h - halo, 0), rows_total - span_h),
        16,
    )
    col_base = pl.multiple_of(
        jnp.minimum(jnp.maximum(j * tile_w - halo, 0), cols_total - span_w),
        16,
    )
    row_off = i * tile_h - row_base  # in {0, HALO, 2*HALO}
    col_off = j * tile_w - col_base

    copies = [
        pltpu.make_async_copy(
            vol_hbm.at[
                pl.ds(row_base, span_h),
                pl.ds(col_base, span_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ],
            win_ref,
            dma_sems.at[0],
        ),
        # arm planes at the *destination* columns (aligned at j*TW), at
        # the window's rows (same row_base => rows align with win_ref)
        pltpu.make_async_copy(
            arml_hbm.at[pl.ds(row_base, span_h),
                        pl.ds(pl.multiple_of(j * tile_w, 128), tile_w)],
            arml_vmem,
            dma_sems.at[1],
        ),
        pltpu.make_async_copy(
            armr_hbm.at[pl.ds(row_base, span_h),
                        pl.ds(pl.multiple_of(j * tile_w, 128), tile_w)],
            armr_vmem,
            dma_sems.at[2],
        ),
    ]
    for copy in copies:
        copy.start()
    for copy in copies:
        copy.wait()

    compute_dtype = (
        jnp.float32 if win_ref.dtype == jnp.float32 else jnp.bfloat16
    )
    precision = (
        lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    )

    # Phase 1 (MXU): mid[m, b, d] = sum_a mask[m, a, b] win[m, a, d].
    # Window column a holds global column col_base + a; dest column b is
    # global col_base + col_off + b, so the source-dest offset is
    # a - b - col_off; it must lie within [-left_arm, right_arm].
    delta = (
        lax.broadcasted_iota(jnp.int32, (span_h, span_w, tile_w), 1)
        - lax.broadcasted_iota(jnp.int32, (span_h, span_w, tile_w), 2)
        - col_off
    )
    mask = (
        (delta >= -arml_vmem[:, :][:, None, :])
        & (delta <= armr_vmem[:, :][:, None, :])
    ).astype(compute_dtype)
    mid_ref[:, :, :] = lax.dot_general(
        mask,
        win_ref[:, :, :].astype(compute_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    # Phase 2 (MXU): out[t, w, d] = sum_m vmask[w, m, t] mid[w, m, d],
    # batched over columns. Mid row m holds global row row_base + m; out
    # row t is global row_base + row_off + t, so the source-dest offset
    # is m - t - row_off; it must lie within [-up_arm, down_arm]. Always
    # f32 (see module docstring).
    delta2 = (
        lax.broadcasted_iota(jnp.int32, (tile_w, span_h, tile_h), 1)
        - lax.broadcasted_iota(jnp.int32, (tile_w, span_h, tile_h), 2)
        - row_off
    )
    armu_t = armu_ref[:, :].T  # (TW, TH)
    armd_t = armd_ref[:, :].T
    vmask = (
        (delta2 >= -armu_t[:, None, :]) & (delta2 <= armd_t[:, None, :])
    ).astype(jnp.float32)
    mid_t = jnp.swapaxes(mid_ref[:, :, :], 0, 1)  # (TW, span_h, TD) f32
    agg = lax.dot_general(
        vmask,
        mid_t,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (TW, TH, TD)
    out_ref[:, :, :] = (
        jnp.swapaxes(agg, 0, 1) * inv_ref[:, :][:, :, None]
    ).astype(out_ref.dtype)


def cbca_fused(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int | None = None,
    tile_w: int = 128,
    tile_d: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` (f32 and bf16 volumes).

    Falls back to the XLA stencil for shapes smaller than one haloed tile.
    Measured per round on v5e: 45.8 ms f32 at half-res scale
    (1000x1504x256), 172 ms bf16 at full-res scale (2000x3072x512). The
    dense-mask einsum (ops/cbca_mxu.py, 27.8 ms/round) stays the half-res
    champion but its O(H*W*W) masks are impossible at full-res; this
    kernel is the full-res and sharded path.
    """
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_h is None:
        tile_h = 16
    if tile_d is None:
        # bf16 halves the window VMEM; spending it on a deeper d tile
        # halves the mask-generation passes (full-res: 155 -> 148
        # ms/round). f32 at tile_d=256 exceeds VMEM (compiler crash).
        tile_d = (
            256 if volume.dtype == jnp.bfloat16 and volume.shape[2] >= 256
            else 128
        )
    if tile_h % 16 or tile_w % 128 or tile_d % 128:
        raise ValueError(
            "tile_h must be a multiple of 16 and tile_w/tile_d of 128 "
            "(the clamped DMA bases must stay provably aligned)"
        )
    radius = distance_threshold - 1
    if radius > _HALO:
        raise ValueError(
            f"distance_threshold {distance_threshold} exceeds the kernel "
            f"halo ({_HALO}); use the XLA path for larger crosses"
        )

    height, width, d_pad = volume.shape
    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    dp = _round_up(d_pad, tile_d)
    if hp < tile_h + 2 * _HALO or wp < tile_w + 2 * _HALO:
        # too small for a clamped haloed tile — tiny images take the exact
        # XLA stencil (identical semantics)
        return cbca(volume, arms, num_iterations, distance_threshold)

    pad_h, pad_w, pad_d = hp - height, wp - width, dp - d_pad

    def pad2(plane):
        return jnp.pad(plane, ((0, pad_h), (0, pad_w)))

    # padded pixels have zero arms: they aggregate only themselves and are
    # never reached by real pixels' (border-capped) arms
    arm_l = pad2(arms.left)
    arm_r = pad2(arms.right)
    arm_u = pad2(arms.up)
    arm_d = pad2(arms.down)

    h_count = (arm_l + arm_r + 1).astype(jnp.float32)
    region_size = _arm_stencil_sum(
        h_count, arm_u, arm_d, axis=0, distance_threshold=distance_threshold
    )
    inv_region = 1.0 / region_size

    kernel = functools.partial(
        _round_kernel,
        radius=radius,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_d=tile_d,
        rows_total=hp,
        cols_total=wp,
    )
    span_h = tile_h + 2 * _HALO
    span_w = tile_w + 2 * _HALO
    scratch_shapes = [
        pltpu.VMEM((span_h, span_w, tile_d), volume.dtype),  # window
        pltpu.VMEM((span_h, tile_w, tile_d), jnp.float32),   # mid (f32)
        pltpu.VMEM((span_h, tile_w), jnp.int32),
        pltpu.VMEM((span_h, tile_w), jnp.int32),
        pltpu.SemaphoreType.DMA((3,)),
    ]

    call = pl.pallas_call(
        kernel,
        grid=(hp // tile_h, wp // tile_w, dp // tile_d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume, manual clamped DMA
            pl.BlockSpec(memory_space=pl.ANY),  # left arms, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # right arms, manual DMA
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
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    padded = jnp.pad(volume, ((0, pad_h), (0, pad_w), (0, pad_d)))

    def one_round(_, vol):
        return call(vol, arm_l, arm_r, arm_u, arm_d, inv_region)

    out = lax.fori_loop(0, num_iterations, one_round, padded)
    return out[:height, :width, :d_pad]
