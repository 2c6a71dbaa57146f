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
    (w, m, t) layout — pre-scaled by 1/region_size, so the division is
    free — and mid transposed once in VMEM. The dot always computes f32
    (its flops are tiny — K = span_h — the result is exact, and the bf16
    version of the same dot hangs the Mosaic compiler).

v2 structure (round 3): the pallas grid is spatial only, (h_tiles,
w_tiles); the disparity axis is an in-kernel fori_loop over tile_d-sized
chunks with manual double-buffered DMA. This fixes the two v1
inefficiencies the round-2 review called out: the masks (which depend
only on (h, w)) are generated ONCE per spatial tile instead of once per
(h, w, d) grid step, and the window read of chunk k+1 overlaps the
matmuls of chunk k (v1's manual DMA was serialized with compute — the
Mosaic grid pipeliner only overlaps BlockSpec operands). Output chunks
are likewise written through a rotating DMA buffer.

Border handling needs NO data canonicalization: the haloed read window is
DMA'd with *clamped* bases (no padded volume copies per round), and the
clamp offsets (row_off / col_off, each in {0, HALO, 2*HALO}) are folded
into the mask arithmetic — window column a sees dest column b at offset
a - b - col_off, and window row m sees dest row t at offset m - t -
row_off. The border-capped arms (arm_up[h] <= h etc.) guarantee every
gated source lies inside the clamped window, so no out-of-window value is
ever touched.

bfloat16 volumes are the fast mode (and the full-resolution memory mode):
storage bf16, phase-1 multiplies bf16, all accumulation f32 — strictly
tighter numerics than ops/cbca_mxu, which also quantizes the horizontal
sums to bf16.
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

_BIG_CUTOFF = 1e8  # values above this are BIG_COST pad sentinels


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _quantize_int8(volume: jax.Array):
    """Symmetric per-call int8 quantization of a cost volume.

    One scale per call, computed from the valid (non-BIG) values:
    aggregation rounds are convex averages, so |avg| <= max|v| and the
    entry scale stays valid for every subsequent round. BIG_COST pad
    lanes quantize to exactly 127 while valid values round to <= 126, so
    q == 127 identifies BIG bijectively (they average only among
    themselves spatially and stay 127 under integer-average rounds) —
    dequantization restores the sentinel by value, keeping no f32 copy
    of the input alive across the rounds (the full-res memory budget).
    """
    vol_f = volume.astype(jnp.float32)
    big = vol_f >= _BIG_CUTOFF
    amax = jnp.max(jnp.where(big, 0.0, jnp.abs(vol_f)))
    scale = 126.0 / jnp.maximum(amax, 1e-30)
    q = jnp.clip(jnp.round(vol_f * scale), -126.0, 126.0)
    q = jnp.where(big, 127.0, q).astype(jnp.int8)
    return q, scale


def _dequantize_int8(q: jax.Array, scale, out_dtype) -> jax.Array:
    """Invert ``_quantize_int8``; q == 127 restores the BIG_COST sentinel."""
    from mccnn_tpu.ops.common import BIG_COST

    deq = q.astype(jnp.float32) / scale
    return jnp.where(q == 127, BIG_COST, deq).astype(out_dtype)


def cbca_int8_xla(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
) -> jax.Array:
    """XLA reference of the int8-storage aggregation (and small-shape path).

    Arithmetic is identical to the int8 kernel: quantize once, then each
    round computes round(sum(q) * inv_region) on exact integer sums
    (integers < 2^24 are exact in f32, and both paths multiply by the same
    f32 inverse), so kernel and this sim agree bit-for-bit.
    """
    if num_iterations == 0:
        return volume
    raw = volume.dtype == jnp.int8  # pre-quantized (the sharded wrapper
    # quantizes ONCE globally so shards share the scale); stay int8
    if raw:
        q = volume
    else:
        q, scale = _quantize_int8(volume)

    def one_round(_, qv):
        out = cbca(qv.astype(jnp.float32), arms, 1, distance_threshold)
        return jnp.round(out).astype(jnp.int8)

    q = lax.fori_loop(0, num_iterations, one_round, q)
    return q if raw else _dequantize_int8(q, scale, volume.dtype)


def _round_kernel(
    vol_hbm,     # (H_r, W_r, D_r) volume, ANY/HBM (manual clamped DMA)
    arml_hbm,    # (H_r, W_r) int32 left-arm plane, ANY/HBM
    armr_hbm,
    armu_ref,    # (TH, TW) int32 block (up arms at the out tile)
    armd_ref,
    inv_ref,     # (TH, TW) f32 block (1 / region size)
    out_hbm,     # (H_r, W_r, D_r) output, ANY/HBM (manual DMA out)
    win_ref,     # scratch (2, TH + 2*HALO, TW + 2*HALO, TD), volume dtype
    mask_ref,    # scratch (span_h, span_w, TW), compute dtype
    vmask_ref,   # scratch (TW, span_h, TH) f32, pre-scaled by 1/region
    mid_ref,     # scratch (span_h, TW, TD) f32 horizontal sums
    outb_ref,    # scratch (out_bufs, TH, TW, TD), volume dtype
    arml_vmem,   # scratch (span_h, TW) int32 (DMA'd, window rows)
    armr_vmem,
    arm_sems,    # (2,)
    win_sems,    # (2,)
    out_sems,    # (out_bufs,)
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    n_chunks: int,
    out_bufs: int,
    rows_total: int,
    cols_total: int,
    compute_dtype,
    bsplit: int | None,
    phase2_precision,
    dsplit: bool,
):
    halo = _HALO
    i = pl.program_id(0)
    j = pl.program_id(1)
    span_h = tile_h + 2 * halo
    span_w = tile_w + 2 * halo

    # Clamp the haloed read window into the array. The clamped bases stay
    # 16-aligned (tile sizes and HALO are multiples of 16), which Mosaic
    # needs to prove for the W (second-minor) volume DMA offset and the
    # row (sublane) offset of the 2D arm-plane slices.
    def bases(ti, tj):
        rb = pl.multiple_of(
            jnp.minimum(jnp.maximum(ti * tile_h - halo, 0),
                        rows_total - span_h),
            16,
        )
        cb = pl.multiple_of(
            jnp.minimum(jnp.maximum(tj * tile_w - halo, 0),
                        cols_total - span_w),
            16,
        )
        return rb, cb

    row_base, col_base = bases(i, j)
    row_off = i * tile_h - row_base  # in {0, HALO, 2*HALO}
    col_off = j * tile_w - col_base

    def win_dma_at(slot, k, rb, cb):
        # dsplit: the volume is stored (n_chunks, H_r, W_r, tile_d) — the
        # d-chunk axis major — so this window read is a contiguous
        # span_w*tile_d run per row (~40 KB bf16) instead of a tile_d-lane
        # fiber per (row, col); k is a static unrolled-loop index.
        src = (
            vol_hbm.at[k, pl.ds(rb, span_h), pl.ds(cb, span_w), :]
            if dsplit
            else vol_hbm.at[
                pl.ds(rb, span_h),
                pl.ds(cb, span_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ]
        )
        return pltpu.make_async_copy(src, win_ref.at[slot], win_sems.at[slot])

    def win_dma(slot, k):
        return win_dma_at(slot, k, row_base, col_base)

    # Cross-tile prefetch: the predecessor tile starts THIS tile's chunk-0
    # window DMA (descriptors match: same slot-0 buffer, same semaphore,
    # bases computed from the successor's grid point), so the fetch
    # overlaps the predecessor's remaining matmuls instead of serializing
    # with this tile's (the exposed chunk-0 DMA was ~1/3 of the tile time
    # at n_chunks=1). Only valid while slot 0 is not recycled within a
    # tile, i.e. n_chunks <= 2; the grid must run row-major, so the
    # pallas_call declares "arbitrary" dimension semantics.
    prefetch = n_chunks <= 2

    def out_dma(slot, k):
        dst = (
            out_hbm.at[
                k,
                pl.ds(i * tile_h, tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                :,
            ]
            if dsplit
            else out_hbm.at[
                pl.ds(i * tile_h, tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ]
        )
        return pltpu.make_async_copy(outb_ref.at[slot], dst, out_sems.at[slot])

    arm_copies = [
        # arm planes at the *destination* columns (aligned at j*TW), at
        # the window's rows (same row_base => rows align with win_ref)
        pltpu.make_async_copy(
            arml_hbm.at[pl.ds(row_base, span_h),
                        pl.ds(pl.multiple_of(j * tile_w, 128), tile_w)],
            arml_vmem,
            arm_sems.at[0],
        ),
        pltpu.make_async_copy(
            armr_hbm.at[pl.ds(row_base, span_h),
                        pl.ds(pl.multiple_of(j * tile_w, 128), tile_w)],
            armr_vmem,
            arm_sems.at[1],
        ),
    ]
    for copy in arm_copies:
        copy.start()
    if prefetch:
        # chunk 0 was started by the predecessor tile; only the very first
        # grid point must start its own
        @pl.when((i == 0) & (j == 0))
        def _():
            win_dma(0, 0).start()
    else:
        # first window chunk streams in while the masks are generated
        win_dma(0, 0).start()
    for copy in arm_copies:
        copy.wait()

    precision = (
        lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    )

    # Horizontal mask (built once per spatial tile, reused for every d
    # chunk): mask[m, a, b] = 1 iff window column a lies on the horizontal
    # arm of dest column b in window row m. Window column a holds global
    # column col_base + a; dest column b is global col_base + col_off + b,
    # so the source-dest offset a - b - col_off must lie within
    # [-left_arm, right_arm] <=> a in [b + col_off - arml, b + col_off + armr].
    b_cols = (
        lax.broadcasted_iota(jnp.int32, (span_h, tile_w), 1) + col_off
    )
    lo = b_cols - arml_vmem[:, :]
    hi = b_cols + armr_vmem[:, :]
    if bsplit is None:
        a_idx = lax.broadcasted_iota(jnp.int32, (span_h, span_w, tile_w), 1)
        mask_ref[:, :, :] = (
            (a_idx >= lo[:, None, :]) & (a_idx <= hi[:, None, :])
        ).astype(compute_dtype)
        a_bases = None
    else:
        # Dest-column split: the arm band is <= 2*HALO-5 wide, so dest
        # columns [b0, b0+bsplit) only ever gate window columns
        # [b0+col_off-HALO, b0+col_off+bsplit+HALO) — a K = bsplit+2*HALO
        # contraction instead of span_w. At bsplit=32 that is 40% of the
        # dense MACs; phase 1 is MXU-throughput-bound at full-res, so the
        # saved flops are saved wall-clock. Each split's mask is built in
        # the split's own window-offset frame (k = a - a_base); the
        # matching window slice is a dynamic SUBLANE slice (allowed by
        # Mosaic, unlike lane slices) whose 16-alignment follows from
        # b0/col_off/HALO all being multiples of 16.
        ksize = bsplit + 2 * halo
        a_bases = []
        for s in range(tile_w // bsplit):
            b0 = s * bsplit
            a_base = pl.multiple_of(
                jnp.clip(b0 + col_off - halo, 0, span_w - ksize), 16
            )
            a_bases.append(a_base)
            k_idx = (
                lax.broadcasted_iota(jnp.int32, (span_h, ksize, bsplit), 1)
                + a_base
            )
            # static slices via lax.slice (a jnp value[...] mixed slice
            # lowers through gather, which Mosaic rejects)
            lo_s = lax.slice_in_dim(lo, b0, b0 + bsplit, axis=1)
            hi_s = lax.slice_in_dim(hi, b0, b0 + bsplit, axis=1)
            mask_ref[s] = (
                (k_idx >= lo_s[:, None, :]) & (k_idx <= hi_s[:, None, :])
            ).astype(compute_dtype)

    # Vertical mask, generated directly in (w, m, t) layout as plain 0/1:
    # vmask[b, m, t] = 1 iff window row m lies on the vertical arm of dest
    # row t. The 1/region division is applied AFTER the dot (one VPU
    # multiply per output chunk) — sum-then-divide matches the XLA
    # stencil's order, and a 0/1 mask is exactly representable in bf16, so
    # a DEFAULT-precision (1-bf16-pass) phase-2 dot loses nothing on the
    # mask side; its only rounding is the mid quantization. Mid row m
    # holds global row row_base + m; out row t is global row_base +
    # row_off + t, so m - t - row_off must lie within [-up_arm, down_arm].
    armu_t = armu_ref[:, :].T  # (TW, TH) int32
    armd_t = armd_ref[:, :].T
    inv_t = inv_ref[:, :].T    # (TW, TH) f32
    t_rows = (
        lax.broadcasted_iota(jnp.int32, (tile_w, tile_h), 1) + row_off
    )
    lo2 = t_rows - armu_t
    hi2 = t_rows + armd_t
    m_idx = lax.broadcasted_iota(jnp.int32, (tile_w, span_h, tile_h), 1)
    vmask_ref[:, :, :] = (
        (m_idx >= lo2[:, None, :]) & (m_idx <= hi2[:, None, :])
    ).astype(jnp.float32)

    # The d-chunk loop is unrolled in Python (n_chunks is small and
    # static): a lax.fori_loop whose body starts/waits DMAs through
    # traced `.at[slot]` buffer indices hangs the Mosaic compiler
    # (measured: >12 min on both f32 and bf16 at half-res; the unrolled
    # form with static slots compiles normally).
    for k in range(n_chunks):
        w_slot = k % 2
        o_slot = k % out_bufs
        if k + 1 < n_chunks:
            win_dma((k + 1) % 2, k + 1).start()
        win_dma(w_slot, k).wait()

        # Phase 1 (MXU): mid[m, b, d] = sum_a mask[m, a, b] win[m, a, d].
        # int8 mode: i8 0/1 mask x i8 window -> i32 accumulation (native
        # int8 MXU; the <= 29-term sums are EXACT integers, tighter than
        # the bf16 mode's rounded products).
        mid_acc = jnp.int32 if compute_dtype == jnp.int8 else jnp.float32
        if bsplit is None:
            mid_ref[:, :, :] = lax.dot_general(
                mask_ref[:, :, :],
                win_ref[w_slot].astype(compute_dtype),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=mid_acc,
                precision=precision,
            )
        else:
            ksize = bsplit + 2 * halo
            for s in range(tile_w // bsplit):
                win_s = win_ref[
                    w_slot, :, pl.ds(a_bases[s], ksize), :
                ].astype(compute_dtype)
                mid_ref[:, s * bsplit:(s + 1) * bsplit, :] = lax.dot_general(
                    mask_ref[s],
                    win_s,
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=mid_acc,
                    precision=precision,
                )

        if k == 0 and prefetch:
            # slot 0 is consumed (phase 1 above read it); hand it to the
            # successor tile's chunk-0 window so that DMA rides under the
            # rest of this tile's matmuls
            grid_h = pl.num_programs(0)
            grid_w = pl.num_programs(1)
            wraps = j + 1 >= grid_w
            nj = jnp.where(wraps, 0, j + 1)
            ni = jnp.minimum(jnp.where(wraps, i + 1, i), grid_h - 1)
            nrb, ncb = bases(ni, nj)

            @pl.when(jnp.logical_not((i == grid_h - 1) & (j == grid_w - 1)))
            def _():
                win_dma_at(0, 0, nrb, ncb).start()

        # The rotating out buffer must have drained before it is rewritten.
        # Out buffers and their semaphores persist across grid steps (the
        # sequential "arbitrary" grid), so the previous DMA on this slot
        # may belong to the PREDECESSOR tile — wait on the slot's
        # semaphore whenever any copy is outstanding on it (the wait
        # descriptor only fixes the byte count, which is identical for
        # every out chunk), instead of draining every DMA at tile end
        # (that exposed the last chunk's ~2 MB write on the critical path
        # of every tile).
        g = (i * pl.num_programs(1) + j) * n_chunks + k

        @pl.when(g >= out_bufs)
        def _():
            out_dma(o_slot, k).wait()

        # Phase 2 (MXU): out[t, b, d] = inv[t, b] * sum_m vmask[b, m, t]
        # mid[m, b, d], batched over columns b; f32 operands/accumulation,
        # pass count set by phase2_precision (see module docstring).
        # int8 mode widens the i32 horizontal sums to f32 first (ints up
        # to ~1e5 are exact in f32, so HIGHEST phase 2 keeps the whole
        # round's arithmetic exact integer math up to the final rounding).
        mid = mid_ref[:, :, :]
        if compute_dtype == jnp.int8:
            mid = mid.astype(jnp.float32)
        mid_t = jnp.swapaxes(mid, 0, 1)  # (TW, span_h, TD)
        agg = lax.dot_general(
            vmask_ref[:, :, :],
            mid_t,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=phase2_precision,
        )  # (TW, TH, TD)
        agg = agg * inv_t[:, :, None]
        res = jnp.swapaxes(agg, 0, 1)
        if compute_dtype == jnp.int8:
            # round-half-even average in quantized units; the convex
            # average of values in [-127, 127] stays in range, no clip
            res = jnp.round(res).astype(jnp.int32)
        outb_ref[o_slot] = res.astype(outb_ref.dtype)
        out_dma(o_slot, k).start()

    # drain the in-flight writes only once, at the end of the LAST grid
    # step (cross-tile waits above cover every earlier reuse)
    @pl.when(
        (i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1)
    )
    def _():
        for k in range(max(0, n_chunks - out_bufs), n_chunks):
            out_dma(k % out_bufs, k).wait()


def cbca_fused(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int = 14,
    tile_h: int | None = None,
    tile_w: int = 128,
    tile_d: int | None = None,
    out_bufs: int = 2,
    interpret: bool | None = None,
    compute_dtype=None,
    bsplit: int | None = None,
    phase2_precision: str | lax.Precision | None = None,
    dsplit: bool = False,
    int8_storage: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` (f32 and bf16 volumes).

    Falls back to the XLA stencil for shapes smaller than one haloed tile.
    ``tile_d`` is the in-kernel disparity chunk (the kernel loops over
    D/tile_d chunks per spatial tile with double-buffered DMA).

    ``bsplit`` splits phase 1's dest columns so each dot contracts only a
    K = bsplit + 2*HALO window slice instead of the whole span_w (the arm
    band is narrow; the dense contraction is mostly zeros). ``None``
    restores the single dense dot.

    ``compute_dtype`` sets the phase-1 multiply precision independently of
    the storage dtype. Default: matches storage (f32 volume -> exact f32
    aggregation; bf16 volume -> bf16 multiplies, f32 accumulation).
    ``compute_dtype=jnp.bfloat16`` with an f32 volume is the fast mixed
    mode (cbca_impl="fused16"): full-precision storage between stages,
    MXU-rate bf16 multiplies inside the round — the same numerics class as
    ops/cbca_mxu (one bf16 quantization of the operand per round), but
    quantizing only phase 1's multiplicands, not the horizontal sums.

    ``dsplit=True`` transposes the volume to a (D/tile_d, H, W, tile_d)
    layout for the duration of the rounds, making every in-kernel window
    DMA a contiguous span_w*tile_d run per row instead of a tile_d-lane
    fiber per (row, col) — a contiguity experiment against the measured
    237 GB/s floor of the flat layout (tools/bench_cbca_stream.py). Two
    layout-conversion passes bracket the round loop.

    ``phase2_precision`` sets the vertical dot's TPU matmul precision
    (f32 operands: DEFAULT = 1 bf16 pass, HIGHEST = 6; Mosaic's kernel
    lowering rejects HIGH). The pass count is MXU issue slots, and the
    kernel is issue-bound, so phase 2's passes are ~40% of the round:
    measured per round at half-res, bf16 12.9 -> 10.1 ms and mixed
    19.7 -> 16.7 switching HIGHEST -> DEFAULT. Default: HIGHEST for
    exact f32 aggregation, DEFAULT for the bf16/mixed fast modes — the
    0/1 vertical mask is exact under the pass's bf16 quantization, so
    the only added rounding is one bf16 quantization of the (f32)
    horizontal sums per round, the same numerics class as the modes'
    phase-1 quantization.

    ``int8_storage=True`` is the bandwidth mode: the volume is quantized
    ONCE (symmetric per-call scale from the valid values — see
    ``_quantize_int8``) and every round runs as exact integer math: i8
    0/1 mask x i8 window -> i32 phase-1 sums on the native int8 MXU, f32
    HIGHEST phase 2 (integer sums < 2^24 are exact in f32), and a
    round-half-even int8 store of the average. Per-round DMA bytes halve
    vs bf16 (the round is DMA-bound — BASELINE.md's stream-floor
    argument); the only inexactness is the entry quantization plus one
    <= 0.5-step rounding of each round's average
    (quality probed at headline scale: tools/probe_cbca_int8.py).
    """
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_h is None:
        # Bigger row tiles cut the haloed-window read amplification
        # ((th+32)/th x 1.25) AND phase-1's per-pixel MACs (batch dim =
        # span_h while outputs are tile_h rows). Measured bf16 ms/round,
        # th 32 -> 48 -> 64: half-res 13.4 -> 12.9 -> 12.9; full-res-width
        # (1000x3008x256) 25.0 -> - -> 23.2. tile_w stays 128: tw256
        # contracts span_w=288 per output column (~2x the phase-1 flops)
        # and measured 22% slower than tw128 at th64.
        tile_h = 64
    if tile_d is None:
        tile_d = 128
    if tile_h % 16 or tile_w % 128 or tile_d % 128:
        raise ValueError(
            "tile_h must be a multiple of 16 and tile_w/tile_d of 128 "
            "(the clamped DMA bases must stay provably aligned)"
        )
    if bsplit is not None and (bsplit % 16 or tile_w % bsplit):
        raise ValueError(
            "bsplit must be a multiple of 16 dividing tile_w (split bases "
            "feed 16-aligned sublane slices)"
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
        # XLA path (identical semantics per mode)
        if int8_storage:
            return cbca_int8_xla(volume, arms, num_iterations,
                                 distance_threshold)
        return cbca(volume, arms, num_iterations, distance_threshold)

    pad_h, pad_w, pad_d = hp - height, wp - width, dp - d_pad
    n_chunks = dp // tile_d
    out_bufs = min(out_bufs, n_chunks)

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

    if int8_storage:
        compute_dtype = jnp.int8  # i8 mask x i8 window -> i32 phase 1
    elif compute_dtype is None:
        compute_dtype = (
            jnp.float32 if volume.dtype == jnp.float32 else jnp.bfloat16
        )
    compute_dtype = jnp.dtype(compute_dtype)
    storage_dtype = jnp.int8 if int8_storage else volume.dtype
    if isinstance(phase2_precision, str):
        phase2_precision = lax.Precision[phase2_precision.upper()]
    if phase2_precision is None:
        # int8 mode keeps HIGHEST: exact integer f32 phase 2 makes the
        # whole round deterministic integer math (bit-equal to the XLA sim)
        phase2_precision = (
            lax.Precision.HIGHEST
            if compute_dtype in (jnp.float32, jnp.int8)
            else lax.Precision.DEFAULT
        )
    kernel = functools.partial(
        _round_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_d=tile_d,
        n_chunks=n_chunks,
        out_bufs=out_bufs,
        rows_total=hp,
        cols_total=wp,
        compute_dtype=compute_dtype,
        bsplit=bsplit,
        phase2_precision=phase2_precision,
        dsplit=dsplit,
    )
    span_h = tile_h + 2 * _HALO
    span_w = tile_w + 2 * _HALO
    mask_shape = (
        (span_h, span_w, tile_w) if bsplit is None
        else (tile_w // bsplit, span_h, bsplit + 2 * _HALO, bsplit)
    )
    mid_dtype = jnp.int32 if int8_storage else jnp.float32
    scratch_shapes = [
        pltpu.VMEM((2, span_h, span_w, tile_d), storage_dtype),  # windows
        pltpu.VMEM(mask_shape, compute_dtype),                   # h-mask
        pltpu.VMEM((tile_w, span_h, tile_h), jnp.float32),       # v-mask
        pltpu.VMEM((span_h, tile_w, tile_d), mid_dtype),         # mid
        pltpu.VMEM((out_bufs, tile_h, tile_w, tile_d), storage_dtype),
        pltpu.VMEM((span_h, tile_w), jnp.int32),
        pltpu.VMEM((span_h, tile_w), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((out_bufs,)),
    ]

    call = pl.pallas_call(
        kernel,
        grid=(hp // tile_h, wp // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume, manual clamped DMA
            pl.BlockSpec(memory_space=pl.ANY),  # left arms, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # right arms, manual DMA
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA out
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, hp, wp, tile_d) if dsplit else (hp, wp, dp),
            storage_dtype,
        ),
        scratch_shapes=scratch_shapes,
        # the double-buffered windows + persistent masks exceed the 16 MB
        # default *scoped* limit (v5e physical VMEM is 128 MB); measured
        # peak is ~20-30 MB depending on tile_h
        compiler_params=pltpu.CompilerParams(
            # "arbitrary" pins the sequential row-major grid order the
            # cross-tile chunk-0 prefetch relies on
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    work = volume
    int8_raw = int8_storage and volume.dtype == jnp.int8
    if int8_storage and not int8_raw:
        work, scale = _quantize_int8(volume)
    padded = jnp.pad(work, ((0, pad_h), (0, pad_w), (0, pad_d)))
    if dsplit:
        padded = jnp.transpose(
            padded.reshape(hp, wp, n_chunks, tile_d), (2, 0, 1, 3)
        )

    def one_round(_, vol):
        return call(vol, arm_l, arm_r, arm_u, arm_d, inv_region)

    out = lax.fori_loop(0, num_iterations, one_round, padded)
    if dsplit:
        out = jnp.transpose(out, (1, 2, 0, 3)).reshape(hp, wp, dp)
    out = out[:height, :width, :d_pad]
    if int8_storage and not int8_raw:
        out = _dequantize_int8(out, scale, volume.dtype)
    return out
