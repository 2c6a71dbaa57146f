"""Pallas TPU kernel: fused CBCA round with VMEM-generated masks.

One aggregation round (reference semantics: src/process_functional.py:146-182
— horizontal arm-gated sum, then vertical arm-gated sum of those sums,
divided by the region size) as a single kernel pass over the volume. It
replaces both the dense (H, W, W)+(W, H, H) HBM mask stacks of ops/cbca_mxu
(O(H*W*W) memory, ~3.8 GB/round of mask traffic at half-res — the full-res
memory wall) and the HBM round-trip of the (H, W, D) horizontal-sum
intermediate that every XLA formulation pays per round.

Block canonicalization: the haloed read window is DMA'd with *clamped*
bases (no padded volume copies per round), then normalized with one roll
per axis — 3 static-shift branches selected on the clamp offset — so that
window row m <-> global row i*TH - HALO + m and column c <-> global column
j*TW - HALO + c for every block, including borders. All stencil reads are
then static-offset slices; rolled-in wrap values correspond to
out-of-image pixels and are zero-gated by the border-capped arms
(arm_up[h] <= h etc.), so they never contribute.

Two phase-1 (horizontal pass) variants:
  * "vpu" (default): the 2*radius+1-term arm-gated stencil vectorized over
    the whole block. Exact-order f32 accumulation (matches ops/cbca's
    stencil semantics); supports f32 and bf16 volumes.
  * "mxu": banded 0/1 masks (span_w source x TW dest columns) generated in
    VMEM from the arm planes and contracted on the MXU as ONE row-batched
    dot_general. (A per-row matmul loop bottoms out on Mosaic's ~1.7us
    per-instruction floor — measured 80 ms/round at half-res.)

Phase 2 (vertical pass) defaults to a column-batched MXU contraction over
the span_h window rows for f32 volumes (the per-term VPU read-modify-write
stencil is VMEM-bandwidth bound: ~50 of the 66 ms/round it replaced) and
to the VPU arm-gated stencil for bf16 volumes (the bf16 MXU phase-2
program hangs the remote Mosaic/XLA compiler).

bfloat16 volumes are the full-resolution memory mode: storage bf16, all
accumulation f32 — strictly tighter numerics than ops/cbca_mxu, which also
quantizes the horizontal sums to bf16.
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
    canon_ref,   # scratch, same shape — roll ping-pong
    mid_ref,     # scratch (TH + 2*HALO, TW, TD) f32
    acc_ref,     # scratch (TH, TW, TD) f32 phase-2 accumulator
    arml_vmem,   # scratch (TH + 2*HALO, TW) int32 (DMA'd, window rows)
    armr_vmem,
    arml_canon,  # scratch (TH + 2*HALO, TW) int32 (row-canonical)
    armr_canon,
    dma_sems,
    *,
    radius: int,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    rows_total: int,
    cols_total: int,
    phase1: str,
    phase2: str,
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
        # arm planes at the *destination* columns (aligned at j*TW)
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

    # column canonicalization: canon[c] = win[c + col_off - HALO].
    # Static slice copies (the 16-column shift is sublane-aligned) — a
    # rotate would hit Mosaic's "non-32-bit rotate" limitation for bf16.
    for off_value in (0, halo, 2 * halo):
        shift = halo - off_value  # columns move right by `shift`

        @pl.when(col_off == off_value)
        def _(shift=shift):
            if shift == 0:
                canon_ref[:, :, :] = win_ref[:, :, :]
            elif shift > 0:
                canon_ref[:, shift:, :] = win_ref[:, : span_w - shift, :]
                canon_ref[:, :shift, :] = win_ref[:, span_w - shift:, :]
            else:
                s = -shift
                canon_ref[:, : span_w - s, :] = win_ref[:, s:, :]
                canon_ref[:, span_w - s:, :] = win_ref[:, :s, :]

    # row canonicalization (dim 0 is untiled: two static slice copies),
    # applied to the volume block and the horizontal arm planes together
    for off_value in (0, halo, 2 * halo):
        shift = halo - off_value  # rows move down by `shift`

        @pl.when(row_off == off_value)
        def _(shift=shift):
            if shift == 0:
                win_ref[:, :, :] = canon_ref[:, :, :]
                arml_canon[:, :] = arml_vmem[:, :]
                armr_canon[:, :] = armr_vmem[:, :]
            elif shift > 0:
                win_ref[shift:, :, :] = canon_ref[: span_h - shift, :, :]
                win_ref[:shift, :, :] = canon_ref[span_h - shift:, :, :]
                arml_canon[shift:, :] = arml_vmem[: span_h - shift, :]
                arml_canon[:shift, :] = arml_vmem[span_h - shift:, :]
                armr_canon[shift:, :] = armr_vmem[: span_h - shift, :]
                armr_canon[:shift, :] = armr_vmem[span_h - shift:, :]
            else:
                s = -shift
                win_ref[: span_h - s, :, :] = canon_ref[s:, :, :]
                win_ref[span_h - s:, :, :] = canon_ref[:s, :, :]
                arml_canon[: span_h - s, :] = arml_vmem[s:, :]
                arml_canon[span_h - s:, :] = arml_vmem[:s, :]
                armr_canon[: span_h - s, :] = armr_vmem[s:, :]
                armr_canon[span_h - s:, :] = armr_vmem[:s, :]

    def gate(plane, offset):
        return (plane >= offset).astype(jnp.float32)[:, :, None]

    if phase1 == "mxu":
        compute_dtype = (
            jnp.float32 if win_ref.dtype == jnp.float32 else jnp.bfloat16
        )
        precision = (
            lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
        )
        # banded masks for ALL rows at once: mask[m, a, b] = 1 iff source
        # column (a - HALO) - b is within [-left, right] of dest column b
        delta = (
            lax.broadcasted_iota(jnp.int32, (span_h, span_w, tile_w), 1)
            - lax.broadcasted_iota(jnp.int32, (span_h, span_w, tile_w), 2)
            - halo
        )
        mask = (
            (delta >= -arml_canon[:, :][:, None, :])
            & (delta <= armr_canon[:, :][:, None, :])
        ).astype(compute_dtype)
        # one row-batched matmul: mid[m, b, d] = sum_a mask[m,a,b] win[m,a,d]
        mid_ref[:, :, :] = lax.dot_general(
            mask,
            win_ref[:, :, :].astype(compute_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    else:
        # Phase 1 (VPU): horizontal arm-gated stencil over all span_h rows
        # at once; every slice is static thanks to the canonicalization.
        mid_ref[:, :, :] = win_ref[:, halo: halo + tile_w, :].astype(
            jnp.float32
        )

        def horiz_body(offset, _):
            right = win_ref[:, pl.ds(halo + offset, tile_w), :].astype(
                jnp.float32
            )
            left = win_ref[:, pl.ds(halo - offset, tile_w), :].astype(
                jnp.float32
            )
            mid_ref[:, :, :] = (
                mid_ref[:, :, :]
                + gate(armr_canon[:, :], offset) * right
                + gate(arml_canon[:, :], offset) * left
            )
            return _

        lax.fori_loop(1, radius + 1, horiz_body, None)

    if phase2 == "mxu":
        # Phase 2 (MXU): out[t, w, d] = sum_m vmask[w, m, t] mid[w, m, d],
        # batched over columns. The per-term VPU read-modify-write loop
        # below is VMEM-bandwidth bound (~50 ms/round of the measured
        # 66 ms at half-res); the contraction over the span_h window rows
        # moves it to the MXU. vmask is generated directly in (w, m, t)
        # layout; mid is transposed once in VMEM. Always f32: the flops
        # are tiny (K = span_h), the result is exact, and the bf16
        # version of this dot hangs the Mosaic compiler.
        delta2 = (
            lax.broadcasted_iota(jnp.int32, (tile_w, span_h, tile_h), 1)
            - lax.broadcasted_iota(jnp.int32, (tile_w, span_h, tile_h), 2)
            - halo
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
        return

    # Phase 2 (VPU): vertical arm-gated stencil over the VMEM mid rows,
    # accumulated in f32, normalized once at the end. Out row t is mid row
    # HALO + t, so all offsets are static slices.
    acc_ref[:, :, :] = mid_ref[halo: halo + tile_h, :, :]

    def vert_body(offset, _):
        down = mid_ref[pl.ds(halo + offset, tile_h), :, :]
        up = mid_ref[pl.ds(halo - offset, tile_h), :, :]
        acc_ref[:, :, :] = (
            acc_ref[:, :, :]
            + gate(armd_ref[:, :], offset) * down
            + gate(armu_ref[:, :], offset) * up
        )
        return _

    lax.fori_loop(1, radius + 1, vert_body, None)
    out_ref[:, :, :] = (
        acc_ref[:, :, :] * inv_ref[:, :][:, :, None]
    ).astype(out_ref.dtype)


def cbca_fused(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int | None = None,
    tile_w: int = 128,
    tile_d: int = 128,
    interpret: bool | None = None,
    phase1: str = "mxu",
    phase2: str | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` (f32 and bf16 volumes).

    Falls back to the XLA stencil for shapes smaller than one haloed tile.
    Measured per round at half-res scale (1000x1504x256, v5e): phase1
    "mxu" (row-batched dot) 66 ms f32 / 43 ms bf16; "vpu" (gated stencil)
    116 ms f32 — "mxu" is the default. The dense-mask einsum
    (ops/cbca_mxu.py, 21 ms/round) stays the half-res champion but its
    O(H*W*W) masks are impossible at full-res; this kernel is the full-res
    and sharded path.
    """
    if num_iterations == 0:
        return volume
    if phase2 is None:
        # Measured per round: f32 half-res 66.5 (vpu) -> 45.8 ms (mxu);
        # bf16 full-res 327.7 (vpu) -> 172.0 ms (mxu). The phase-2 dot
        # itself always runs f32 — a bf16 phase-2 dot hangs the compiler.
        phase2 = "mxu"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_h is None:
        tile_h = 16
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
        phase1=phase1,
        phase2=phase2,
    )
    span_h = tile_h + 2 * _HALO
    span_w = tile_w + 2 * _HALO
    scratch_shapes = [
        pltpu.VMEM((span_h, span_w, tile_d), volume.dtype),  # window
        pltpu.VMEM((span_h, span_w, tile_d), volume.dtype),  # roll temp
        pltpu.VMEM((span_h, tile_w, tile_d), jnp.float32),   # mid (f32)
        pltpu.VMEM((tile_h, tile_w, tile_d), jnp.float32),   # acc
        pltpu.VMEM((span_h, tile_w), jnp.int32),
        pltpu.VMEM((span_h, tile_w), jnp.int32),
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
