"""Pallas TPU kernel: fused CBCA round with a ROLLING row window.

Same semantics as ops/cbca_fused (reference: src/process_functional.py:146-182
— horizontal arm-gated sum, vertical arm-gated sum of those sums, divided by
the region size), but the pallas grid is over column tiles ONLY and the row
axis is swept inside the kernel with a ring-buffered phase-1 intermediate.

Why: the per-(row,col)-tile kernel re-reads the 2*HALO row halo of every
window (read amplification (tile_h + 2*HALO)/tile_h = 1.5x at tile_h 64) and
recomputes phase-1 horizontal sums for those halo rows (the same 1.5x in
phase-1 MACs). Rolling the rows eliminates both: every volume row is DMA'd
once per round (only the 1.25x column halo remains) and phase-1 runs once
per row. At full-res (36 rounds over a 6.4 GB bf16 volume) the saved window
traffic alone is ~4 GB/round.

Structure per (column tile, disparity chunk):

  * Phase 1 advances in SUB = tile_h/2 row sub-steps: DMA one (SUB, span_w,
    tile_d) window strip (double-buffered), build the horizontal band mask
    for those rows, and write the row-batched dot into a (2*tile_h)-row
    ring of f32 horizontal sums (ring slot = row mod 2*tile_h; every
    sub-step lands on a STATIC ring offset because the fori loop processes
    one 2*tile_h row pair-block per iteration).
  * Phase 2 fires once per tile_h output rows, contracting the FULL ring
    (K = 2*tile_h) against a ring-frame vertical mask. Slots outside the
    [t - HALO, t + tile_h + HALO) window belong to rows the border-capped
    arms can never gate (radius <= HALO < SUB), so their mask is zero by
    the same arm comparison that builds the in-window gates — no validity
    term, no data movement. The whole not-yet-written slot range
    [TH+SUB, ring) is zeroed once per chunk before the prologue: its tail
    [ring-HALO, ring) is the top-image halo (rows [-HALO, 0), which don't
    exist) and the gap [TH+SUB, ring-HALO) holds future rows the masks
    zero — but a zero MASK alone doesn't protect the dot from
    uninitialized VMEM (0 * NaN = NaN inside the contraction, observed on
    hardware at tile_h 64), so the VALUES must be zeroed too.

The ring timing is exact: output tile [base, base+tile_h) is contracted
right after the sub-step covering rows [base+tile_h, base+tile_h+SUB)
lands, at which point the ring holds rows [base-tile_h+SUB, base+tile_h+SUB)
⊇ the needed [base-HALO, base+tile_h+HALO) window (SUB >= HALO).

Numerics: identical quantization class to ops/cbca_fused (phase-1
multiplies in ``compute_dtype``, all accumulation f32, one phase-2 dot per
output tile). The phase-2 contraction is K = 2*tile_h instead of
tile_h + 2*HALO, zero-padded by masks — extra flops, identical f32
accumulation semantics up to MXU accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum, cbca

_HALO = 16  # >= stencil radius (13); multiple of 16 for DMA alignment


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _rolling_kernel(
    vol_hbm,     # (H_r, W_r, D_r) volume, ANY/HBM (manual DMA)
    arml_ref,    # (H_r, TW) int32 column strip (left arms at dest columns)
    armr_ref,
    armu_ref,
    armd_ref,
    inv_ref,     # (H_r, TW) f32 column strip (1 / region size)
    out_hbm,     # (H_r, W_r, D_r) output, ANY/HBM (manual DMA out)
    win_ref,     # scratch (2, SUB, span_w, TD), volume dtype
    mid_ref,     # scratch (2*TH, TW, TD) f32 ring of horizontal sums
    outb_ref,    # scratch (2, TH, TW, TD), volume dtype
    win_sems,    # (2,)
    out_sems,    # (2,)
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    n_chunks: int,
    rows_total: int,
    cols_total: int,
    compute_dtype,
    phase2_precision,
):
    halo = _HALO
    sub = tile_h // 2
    ring = 2 * tile_h
    j = pl.program_id(0)
    span_w = tile_w + 2 * halo
    n_pairs = rows_total // ring
    n_tiles_h = rows_total // tile_h

    col_base = pl.multiple_of(
        jnp.minimum(jnp.maximum(j * tile_w - halo, 0), cols_total - span_w),
        16,
    )
    col_off = j * tile_w - col_base

    precision = (
        lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    )

    def win_dma(slot, row, k):
        return pltpu.make_async_copy(
            vol_hbm.at[
                pl.ds(row, sub),
                pl.ds(col_base, span_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ],
            win_ref.at[slot],
            win_sems.at[slot],
        )

    def out_dma(slot, row, k):
        return pltpu.make_async_copy(
            outb_ref.at[slot],
            out_hbm.at[
                pl.ds(row, tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ],
            out_sems.at[slot],
        )

    def p1(slot, row, ring_off, k):
        """Phase 1 for rows [row, row+SUB): wait the strip DMA, build the
        band mask from the arm strips, write the dot at the (static) ring
        offset."""
        win_dma(slot, row, k).wait()
        row = pl.multiple_of(row, 16)
        al = arml_ref[pl.ds(row, sub), :]
        ar = armr_ref[pl.ds(row, sub), :]
        # window column a gates dest column b iff a - b - col_off lies in
        # [-left_arm, right_arm] (same folding as ops/cbca_fused)
        b_cols = lax.broadcasted_iota(jnp.int32, (sub, tile_w), 1) + col_off
        lo = b_cols - al
        hi = b_cols + ar
        a_idx = lax.broadcasted_iota(jnp.int32, (sub, span_w, tile_w), 1)
        hmask = (
            (a_idx >= lo[:, None, :]) & (a_idx <= hi[:, None, :])
        ).astype(compute_dtype)
        mid_ref[pl.ds(ring_off, sub)] = lax.dot_general(
            hmask,
            win_ref[slot].astype(compute_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def p2(row, parity, k, g):
        """Phase 2 for output rows [row, row+TH): contract the full ring
        against the ring-frame vertical mask, scale, DMA out.

        ``parity`` (static) selects the ring->global row mapping: the even
        tile of a pair-block reads its top halo from the ring's wrapped
        tail (slot s >= ring-HALO holds row base+s-ring), the odd tile its
        bottom halo from the wrapped head (slot s < HALO holds row
        base+s+ring). Every other slot maps to row base+s; slots whose
        mapped row lies outside [row-HALO, row+TH+HALO) hold rows the
        border-capped arms never gate, so the arm comparison alone zeroes
        them (radius <= HALO <= SUB).
        """
        row = pl.multiple_of(row, 16)
        au_t = armu_ref[pl.ds(row, tile_h), :].T  # (TW, TH) int32
        ad_t = armd_ref[pl.ds(row, tile_h), :].T
        inv_t = inv_ref[pl.ds(row, tile_h), :].T  # (TW, TH) f32
        t_rows = (
            lax.broadcasted_iota(jnp.int32, (tile_w, tile_h), 1) + row
        )
        lo2 = t_rows - au_t
        hi2 = t_rows + ad_t
        base = row - parity * tile_h  # pair-block base (multiple of ring)
        s_idx = lax.broadcasted_iota(jnp.int32, (tile_w, ring, tile_h), 1)
        if parity == 0:
            m_rows = base + s_idx - jnp.where(s_idx >= ring - halo, ring, 0)
        else:
            m_rows = base + s_idx + jnp.where(s_idx < halo, ring, 0)
        vm = (
            (m_rows >= lo2[:, None, :]) & (m_rows <= hi2[:, None, :])
        ).astype(jnp.float32)
        mid_t = jnp.swapaxes(mid_ref[:, :, :], 0, 1)  # (TW, ring, TD)
        agg = lax.dot_general(
            vm,
            mid_t,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=phase2_precision,
        )  # (TW, TH, TD)
        agg = agg * inv_t[:, :, None]

        # rotating out buffer: drain the slot's previous DMA (possibly from
        # the predecessor tile/chunk/grid step) before rewriting it
        @pl.when(g >= 2)
        def _():
            out_dma(parity, row, k).wait()

        outb_ref[parity] = jnp.swapaxes(agg, 0, 1).astype(outb_ref.dtype)
        out_dma(parity, row, k).start()

    for k in range(n_chunks):
        # Ring slots [TH+SUB, ring) are read by the FIRST p2 of the chunk
        # before anything writes them: [ring-HALO, ring) as the top-image
        # halo (rows [-HALO, 0), which don't exist) and [TH+SUB, ring-HALO)
        # as future rows the masks zero. Zero the VALUES too — the masks
        # alone don't protect the dot from uninitialized VMEM, because
        # 0 * NaN = NaN in the contraction (observed on hardware at
        # tile_h 64; at tile_h 32 the non-halo gap is empty, which is why
        # interpret-mode tests at th32 could not catch it).
        mid_ref[pl.ds(tile_h + sub, ring - tile_h - sub)] = jnp.zeros(
            (ring - tile_h - sub, tile_w, tile_d), jnp.float32
        )
        # prologue: rows [0, TH) through both window buffers
        win_dma(0, 0, k).start()
        win_dma(1, sub, k).start()
        p1(0, 0, 0, k)
        win_dma(0, tile_h, k).start()          # subA of pair 0
        p1(1, sub, sub, k)
        win_dma(1, tile_h + sub, k).start()    # subB of pair 0

        g0 = (j * n_chunks + k) * n_tiles_h

        def body(jj, _, k=k, g0=g0):
            base = jj * ring
            # subA: rows [base+TH, base+TH+SUB) -> ring slot TH
            p1(0, base + tile_h, tile_h, k)

            @pl.when(base + ring < rows_total)  # subC rows exist
            def _():
                win_dma(0, base + ring, k).start()

            p2(base, 0, k, g0 + 2 * jj)
            # subB: rows [base+TH+SUB, base+2TH) -> slot TH+SUB
            p1(1, base + tile_h + sub, tile_h + sub, k)

            @pl.when(base + ring + sub < rows_total)  # subD rows exist
            def _():
                win_dma(1, base + ring + sub, k).start()

            # subC: rows [base+2TH, base+2TH+SUB) -> slot 0 (next pair's
            # window head; runs before p2(odd), whose bottom halo it holds)
            @pl.when(base + ring < rows_total)
            def _():
                p1(0, base + ring, 0, k)

            @pl.when(base + ring + tile_h < rows_total)  # next subA rows
            def _():
                win_dma(0, base + ring + tile_h, k).start()

            p2(base + tile_h, 1, k, g0 + 2 * jj + 1)

            # subD: rows [base+2TH+SUB, base+3TH) -> slot SUB
            @pl.when(base + ring + sub < rows_total)
            def _():
                p1(1, base + ring + sub, sub, k)

            @pl.when(base + ring + tile_h + sub < rows_total)  # next subB
            def _():
                win_dma(1, base + ring + tile_h + sub, k).start()

            return 0

        lax.fori_loop(0, n_pairs, body, 0)

    # drain the last two out DMAs at the very end of the LAST grid step
    # (earlier slot reuses wait inside p2)
    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        last = rows_total - tile_h
        out_dma(0, last - tile_h, n_chunks - 1).wait()
        out_dma(1, last, n_chunks - 1).wait()


def cbca_fused_rolling(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int = 64,
    tile_w: int = 128,
    tile_d: int | None = None,
    interpret: bool | None = None,
    compute_dtype=None,
    phase2_precision: str | lax.Precision | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` (f32 and bf16 volumes).

    Same aggregation semantics and quantization class as
    ``cbca_fused.cbca_fused``; see the module docstring for the rolling-row
    structure. Falls back to the XLA stencil for shapes smaller than one
    haloed column tile.
    """
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_d is None:
        tile_d = 128
    if tile_h % 32 or tile_w % 128 or tile_d % 128:
        raise ValueError(
            "tile_h must be a multiple of 32 (SUB = tile_h/2 ring writes "
            "must stay 16-aligned) and tile_w/tile_d of 128"
        )
    radius = distance_threshold - 1
    if radius > _HALO:
        raise ValueError(
            f"distance_threshold {distance_threshold} exceeds the kernel "
            f"halo ({_HALO}); use the XLA path for larger crosses"
        )

    height, width, d_pad = volume.shape
    hp = _round_up(height, 2 * tile_h)
    wp = _round_up(width, tile_w)
    dp = _round_up(d_pad, tile_d)
    if wp < tile_w + 2 * _HALO:
        return cbca(volume, arms, num_iterations, distance_threshold)

    pad_h, pad_w, pad_d = hp - height, wp - width, dp - d_pad
    n_chunks = dp // tile_d

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

    if compute_dtype is None:
        compute_dtype = (
            jnp.float32 if volume.dtype == jnp.float32 else jnp.bfloat16
        )
    compute_dtype = jnp.dtype(compute_dtype)
    if isinstance(phase2_precision, str):
        phase2_precision = lax.Precision[phase2_precision.upper()]
    if phase2_precision is None:
        phase2_precision = (
            lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else lax.Precision.DEFAULT
        )
    kernel = functools.partial(
        _rolling_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_d=tile_d,
        n_chunks=n_chunks,
        rows_total=hp,
        cols_total=wp,
        compute_dtype=compute_dtype,
        phase2_precision=phase2_precision,
    )
    sub = tile_h // 2
    span_w = tile_w + 2 * _HALO
    strip = lambda j: (0, j)  # noqa: E731 — full-height column strips
    scratch_shapes = [
        pltpu.VMEM((2, sub, span_w, tile_d), volume.dtype),     # windows
        pltpu.VMEM((2 * tile_h, tile_w, tile_d), jnp.float32),  # mid ring
        pltpu.VMEM((2, tile_h, tile_w, tile_d), volume.dtype),  # out bufs
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    call = pl.pallas_call(
        kernel,
        grid=(wp // tile_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume, manual DMA
            pl.BlockSpec((hp, tile_w), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, tile_w), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, tile_w), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, tile_w), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, tile_w), strip, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA out
        out_shape=jax.ShapeDtypeStruct((hp, wp, dp), volume.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the rotating out buffers rely on grid-step
            # order for their cross-step drain waits
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    padded = jnp.pad(volume, ((0, pad_h), (0, pad_w), (0, pad_d)))

    def one_round(_, vol):
        return call(
            vol, arm_l.astype(jnp.int32), arm_r.astype(jnp.int32),
            arm_u.astype(jnp.int32), arm_d.astype(jnp.int32), inv_region,
        )

    out = lax.fori_loop(0, num_iterations, one_round, padded)
    return out[:height, :width, :d_pad]
