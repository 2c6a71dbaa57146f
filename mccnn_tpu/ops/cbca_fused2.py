"""Pallas TPU kernel: TWO fused CBCA rounds per volume pass.

Reference semantics (src/process_functional.py:146-182): one aggregation
round sums the disparity fiber over the cross region (horizontal arm-gated
sum, then vertical arm-gated sum of those sums) and divides by the region
size. ops/cbca_fused.py does one round per HBM pass; its round time is
DMA-floor-bound: tools/bench_cbca_stream.py measures 9.77 ms/round at
half-res bf16 for the *traffic pattern alone* (no compute), against the
fused kernel's 10.65 — and the floor is ~9.8 ms for every viable tiling
(th128 / tw256 / td256 sweeps in ROADMAP.md), so no single-round kernel
can do better than ~memcpy speed.

This kernel cuts the TRAFFIC instead: it computes round k+1 directly from
round k inside VMEM, reading the raw volume once per TWO rounds through a
double-halo window and writing only the final tile:

    traffic / 2 rounds:   read (1+4H/TH)(1+4H/TW) V + write V   = 4.0 V
    two single rounds:  2*(read (1+2H/TH)(1+2H/TW) V + write V) = 5.75 V
    (th64/tw128, H=16)                                       => -30% bytes

at +57% MACs (round A is evaluated on the (TH+2H) x (TW+2H) intermediate
region the output tile's arms can reach) — a win on a DMA-bound kernel.

Structure per (row tile, col tile), masks built once per spatial tile:

  * window: (TH+4H) x (TW+4H) x TD raw volume, clamped bases, offsets
    folded into mask arithmetic (exactly ops/cbca_fused.py's scheme with
    a 2H halo).
  * round A at the intermediate region rows [t-H, t+TH+H) x cols
    [c-H, c+TW+H) — an UNCLAMPED, possibly-virtual range (see below):
    phase A1 row-batched horizontal dot, phase A2 column-batched vertical
    dot, scale by 1/region, quantize to the storage dtype (bf16 storage
    gets the exact same one-quantization-per-round class as the unfused
    kernel's HBM store).
  * round B on the intermediate values: phase B1 contracts the aw
    intermediate columns per dest column, phase B2 the ah intermediate
    rows per dest row; scale, quantize, DMA the (TH, TW, TD) tile out.

Intermediate-region addressing: the region starts at (t-H, c-H), which is
16- but not 128-aligned — an illegal lane offset for the arm/1-region
plane DMAs. Instead of clamping (which would break the A-mask/B-mask
offset algebra at borders), the A-phase planes are DMA'd from PRE-SHIFTED
copies built once per call: plane_cs[r, x] = plane[r, x-H] (A1: arms at
window rows x intermediate cols), plane_rcs[r, x] = plane[r-H, x-H]
(A2/1-region: intermediate rows x cols), plane_rs[r, x] = plane[r-H, x]
(B1: intermediate rows x dest cols) — every DMA then lands on the
128-aligned dest-column grid. Virtual intermediate pixels (outside the
padded image, e.g. cols [-H, 0) of tile j=0) read zero arms and zero
1/region from the shift padding: their masks gate nothing, their values
are exact 0, and no real pixel's border-capped arms ever reach them —
same argument as the padded pixels in ops/cbca_fused.py, and the values
stay finite (0 * NaN lessons from ops/cbca_rolling.py: zeros come from
computed dots here, never from uninitialized VMEM).

Numerics per mode (same classes as cbca_fused):
  * f32 storage: HIGHEST phase dots, f32 intermediate — the two-round
    result equals two exact single rounds.
  * bf16 storage: bf16 phase-1 multiplies, f32 accumulation, DEFAULT
    (1-pass) phase-2 dots, intermediate quantized to bf16 — identical
    quantization chain to running the unfused bf16 kernel twice.
  * mixed (f32 storage, compute_dtype=bf16): f32 intermediate, bf16
    multiplies — cbca_impl="fused16"'s class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum, cbca
from mccnn_tpu.ops.cbca_fused import cbca_fused

_HALO = 16  # >= stencil radius (13); multiple of 16 for DMA alignment


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _two_round_kernel(
    vol_hbm,      # (H_r, W_r, D_r) volume, ANY/HBM (manual clamped DMA)
    a1l_hbm,      # (H_r, W_r + 128) int32, col-shifted left arms   (A1)
    a1r_hbm,
    a2u_hbm,      # (H_r + 2H, W_r + 128) int32, row+col-shifted    (A2)
    a2d_hbm,
    a2inv_hbm,    # (H_r + 2H, W_r + 128) f32, row+col-shifted      (A2)
    b1l_hbm,      # (H_r + 2H, W_r) int32, row-shifted left arms    (B1)
    b1r_hbm,
    armu_ref,     # (TH, TW) int32 block (up arms at the out tile)  (B2)
    armd_ref,
    inv_ref,      # (TH, TW) f32 block (1 / region at the out tile) (B2)
    out_hbm,      # (H_r, W_r, D_r) output, ANY/HBM (manual DMA out)
    win_ref,      # scratch (2, TH + 4H, TW + 4H, TD), volume dtype
    maskA1_ref,   # scratch (span_h, span_w, AW), compute dtype
    vmaskA_ref,   # scratch (AW, span_h, AH) f32
    maskB1_ref,   # scratch (AH, AW, TW), compute dtype
    vmaskB_ref,   # scratch (TW, AH, TH) f32
    outb_ref,     # scratch (out_bufs, TH, TW, TD), volume dtype
    a1l_vmem,     # scratch (span_h, 256) int32
    a1r_vmem,
    a2u_vmem,     # scratch (AH, 256) int32
    a2d_vmem,
    a2inv_vmem,   # scratch (AH, 256) f32
    b1l_vmem,     # scratch (AH, TW) int32
    b1r_vmem,
    arm_sems,     # (7,)
    win_sems,     # (2,)
    out_sems,     # (out_bufs,)
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    n_chunks: int,
    out_bufs: int,
    rows_total: int,
    cols_total: int,
    compute_dtype,
    phase2_precision,
):
    halo = _HALO
    i = pl.program_id(0)
    j = pl.program_id(1)
    span_h = tile_h + 4 * halo   # raw window rows
    span_w = tile_w + 4 * halo   # raw window cols
    ah = tile_h + 2 * halo       # intermediate (round-A dest) rows
    aw = tile_w + 2 * halo       # intermediate (round-A dest) cols

    # Clamped raw-volume window bases (16-aligned: tile sizes and HALO are
    # multiples of 16). The intermediate region base (tb, cb) is NOT
    # clamped — it may start at virtual row/col -H (handled by the
    # shifted-plane zero padding, module docstring).
    def bases(ti, tj):
        rb = pl.multiple_of(
            jnp.minimum(jnp.maximum(ti * tile_h - 2 * halo, 0),
                        rows_total - span_h),
            16,
        )
        cb = pl.multiple_of(
            jnp.minimum(jnp.maximum(tj * tile_w - 2 * halo, 0),
                        cols_total - span_w),
            16,
        )
        return rb, cb

    row_base, col_base = bases(i, j)
    tb = i * tile_h - halo       # intermediate row base (virtual frame)
    cbB = j * tile_w - halo      # intermediate col base (virtual frame)
    roff = tb - row_base         # intermediate rows in window-row frame
    coff = cbB - col_base        # intermediate cols in window-col frame

    def win_dma_at(slot, k, rb, cb):
        return pltpu.make_async_copy(
            vol_hbm.at[
                pl.ds(rb, span_h),
                pl.ds(cb, span_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ],
            win_ref.at[slot],
            win_sems.at[slot],
        )

    def win_dma(slot, k):
        return win_dma_at(slot, k, row_base, col_base)

    prefetch = n_chunks <= 2

    def out_dma(slot, k):
        return pltpu.make_async_copy(
            outb_ref.at[slot],
            out_hbm.at[
                pl.ds(i * tile_h, tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ],
            out_sems.at[slot],
        )

    # Arm/1-region plane DMAs. Every lane offset is the 128-aligned dest
    # column base j*TW (the shifts are baked into the planes); row offsets
    # are the 16-aligned window/tile row bases.
    dcol = pl.multiple_of(j * tile_w, 128)
    trow = pl.multiple_of(i * tile_h, 16)
    arm_copies = [
        pltpu.make_async_copy(      # A1: arms at window rows x interm cols
            a1l_hbm.at[pl.ds(row_base, span_h), pl.ds(dcol, 256)],
            a1l_vmem, arm_sems.at[0]),
        pltpu.make_async_copy(
            a1r_hbm.at[pl.ds(row_base, span_h), pl.ds(dcol, 256)],
            a1r_vmem, arm_sems.at[1]),
        pltpu.make_async_copy(      # A2: arms at interm rows x interm cols
            a2u_hbm.at[pl.ds(trow, ah), pl.ds(dcol, 256)],
            a2u_vmem, arm_sems.at[2]),
        pltpu.make_async_copy(
            a2d_hbm.at[pl.ds(trow, ah), pl.ds(dcol, 256)],
            a2d_vmem, arm_sems.at[3]),
        pltpu.make_async_copy(
            a2inv_hbm.at[pl.ds(trow, ah), pl.ds(dcol, 256)],
            a2inv_vmem, arm_sems.at[4]),
        pltpu.make_async_copy(      # B1: arms at interm rows x dest cols
            b1l_hbm.at[pl.ds(trow, ah), pl.ds(dcol, tile_w)],
            b1l_vmem, arm_sems.at[5]),
        pltpu.make_async_copy(
            b1r_hbm.at[pl.ds(trow, ah), pl.ds(dcol, tile_w)],
            b1r_vmem, arm_sems.at[6]),
    ]
    for copy in arm_copies:
        copy.start()
    if prefetch:
        @pl.when((i == 0) & (j == 0))
        def _():
            win_dma(0, 0).start()
    else:
        win_dma(0, 0).start()
    for copy in arm_copies:
        copy.wait()

    precision = (
        lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    )

    # --- masks, built once per spatial tile ------------------------------
    # A1 (horizontal, round A): maskA1[m, a, b] = 1 iff window column a
    # lies on the horizontal arm of intermediate column b in window row m.
    # Window col a is global col_base + a; intermediate col b is global
    # cbB + b, so a - b - coff must lie in [-left_arm, right_arm].
    a1l = lax.slice_in_dim(a1l_vmem[:, :], 0, aw, axis=1)  # (span_h, AW)
    a1r = lax.slice_in_dim(a1r_vmem[:, :], 0, aw, axis=1)
    b_cols = lax.broadcasted_iota(jnp.int32, (span_h, aw), 1) + coff
    lo1 = b_cols - a1l
    hi1 = b_cols + a1r
    a_idx = lax.broadcasted_iota(jnp.int32, (span_h, span_w, aw), 1)
    maskA1_ref[:, :, :] = (
        (a_idx >= lo1[:, None, :]) & (a_idx <= hi1[:, None, :])
    ).astype(compute_dtype)

    # A2 (vertical, round A), (b, m, t) layout: vmaskA[b, m, t] = 1 iff
    # window row m lies on the vertical arm of intermediate row t at
    # intermediate column b: m - t - roff in [-up_arm, down_arm].
    a2u_t = lax.slice_in_dim(a2u_vmem[:, :], 0, aw, axis=1).T  # (AW, AH)
    a2d_t = lax.slice_in_dim(a2d_vmem[:, :], 0, aw, axis=1).T
    invA_t = lax.slice_in_dim(a2inv_vmem[:, :], 0, aw, axis=1).T  # f32
    t_rows = lax.broadcasted_iota(jnp.int32, (aw, ah), 1) + roff
    lo2 = t_rows - a2u_t
    hi2 = t_rows + a2d_t
    m_idx = lax.broadcasted_iota(jnp.int32, (aw, span_h, ah), 1)
    vmaskA_ref[:, :, :] = (
        (m_idx >= lo2[:, None, :]) & (m_idx <= hi2[:, None, :])
    ).astype(jnp.float32)

    # B1 (horizontal, round B): maskB1[m, a, b] = 1 iff intermediate col a
    # lies on the horizontal arm of dest col b in intermediate row m.
    # Intermediate col a is global cbB + a; dest col b is global j*TW + b:
    # a - b - H in [-left_arm, right_arm] (static offset H = c - cbB).
    b1l = b1l_vmem[:, :]
    b1r = b1r_vmem[:, :]
    b_cols2 = lax.broadcasted_iota(jnp.int32, (ah, tile_w), 1) + halo
    lo3 = b_cols2 - b1l
    hi3 = b_cols2 + b1r
    a_idx2 = lax.broadcasted_iota(jnp.int32, (ah, aw, tile_w), 1)
    maskB1_ref[:, :, :] = (
        (a_idx2 >= lo3[:, None, :]) & (a_idx2 <= hi3[:, None, :])
    ).astype(compute_dtype)

    # B2 (vertical, round B), (b, m, t) layout: intermediate row m (global
    # tb + m) on the vertical arm of dest row t (global i*TH + t):
    # m - t - H in [-up_arm, down_arm].
    armu_t = armu_ref[:, :].T  # (TW, TH)
    armd_t = armd_ref[:, :].T
    invB_t = inv_ref[:, :].T   # (TW, TH) f32
    t_rows2 = lax.broadcasted_iota(jnp.int32, (tile_w, tile_h), 1) + halo
    lo4 = t_rows2 - armu_t
    hi4 = t_rows2 + armd_t
    m_idx2 = lax.broadcasted_iota(jnp.int32, (tile_w, ah, tile_h), 1)
    vmaskB_ref[:, :, :] = (
        (m_idx2 >= lo4[:, None, :]) & (m_idx2 <= hi4[:, None, :])
    ).astype(jnp.float32)

    # --- d-chunk loop (unrolled; static slots — see cbca_fused) ----------
    for k in range(n_chunks):
        w_slot = k % 2
        o_slot = k % out_bufs
        if k + 1 < n_chunks:
            win_dma((k + 1) % 2, k + 1).start()
        win_dma(w_slot, k).wait()

        # Round A, phase 1 (MXU): midA[m, b, d] = sum_a maskA1 * win.
        midA = lax.dot_general(
            maskA1_ref[:, :, :],
            win_ref[w_slot].astype(compute_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (span_h, AW, TD) f32

        if k == 0 and prefetch:
            grid_h = pl.num_programs(0)
            grid_w = pl.num_programs(1)
            wraps = j + 1 >= grid_w
            nj = jnp.where(wraps, 0, j + 1)
            ni = jnp.minimum(jnp.where(wraps, i + 1, i), grid_h - 1)
            nrb, ncb = bases(ni, nj)

            @pl.when(jnp.logical_not((i == grid_h - 1) & (j == grid_w - 1)))
            def _():
                win_dma_at(0, 0, nrb, ncb).start()

        # Round A, phase 2: aggA[b, t, d] = sum_m vmaskA * midA^T; scale
        # by 1/region and quantize to the storage dtype (the inter-round
        # HBM store's quantization, applied in VMEM instead).
        midA_t = jnp.swapaxes(midA, 0, 1)  # (AW, span_h, TD) f32
        aggA = lax.dot_general(
            vmaskA_ref[:, :, :],
            midA_t,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=phase2_precision,
        )  # (AW, AH, TD)
        valA = (
            jnp.swapaxes(aggA * invA_t[:, :, None], 0, 1)
            .astype(outb_ref.dtype)
        )  # (AH, AW, TD), storage dtype

        # Round B, phase 1: midB[m, b, d] = sum_a maskB1 * valA.
        midB = lax.dot_general(
            maskB1_ref[:, :, :],
            valA.astype(compute_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (AH, TW, TD) f32

        g = (i * pl.num_programs(1) + j) * n_chunks + k

        @pl.when(g >= out_bufs)
        def _():
            out_dma(o_slot, k).wait()

        # Round B, phase 2: out[t, b, d] = invB * sum_m vmaskB * midB^T.
        midB_t = jnp.swapaxes(midB, 0, 1)  # (TW, AH, TD)
        aggB = lax.dot_general(
            vmaskB_ref[:, :, :],
            midB_t,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=phase2_precision,
        )  # (TW, TH, TD)
        aggB = aggB * invB_t[:, :, None]
        outb_ref[o_slot] = jnp.swapaxes(aggB, 0, 1).astype(outb_ref.dtype)
        out_dma(o_slot, k).start()

    @pl.when(
        (i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1)
    )
    def _():
        for k in range(max(0, n_chunks - out_bufs), n_chunks):
            out_dma(k % out_bufs, k).wait()


def cbca_fused_two(
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
    phase2_precision: str | lax.Precision | None = None,
) -> jax.Array:
    """Drop-in replacement for ``cbca.cbca`` (f32 and bf16 volumes).

    Runs ``num_iterations // 2`` two-round kernel passes; an odd remainder
    round goes through ``cbca_fused``. Small shapes fall back to
    ``cbca_fused`` (which itself falls back to the XLA stencil).
    """
    if num_iterations == 0:
        return volume
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_h is None:
        tile_h = 64
    if tile_d is None:
        tile_d = 128
    if tile_h % 16 or tile_w % 128 or tile_d % 128:
        raise ValueError(
            "tile_h must be a multiple of 16 and tile_w/tile_d of 128 "
            "(the DMA bases must stay provably aligned)"
        )
    radius = distance_threshold - 1
    if radius > _HALO:
        raise ValueError(
            f"distance_threshold {distance_threshold} exceeds the kernel "
            f"halo ({_HALO}); use the XLA path for larger crosses"
        )

    def single(vol, iters):
        return cbca_fused(
            vol, arms, iters, distance_threshold,
            tile_h=tile_h, tile_w=tile_w, tile_d=tile_d,
            out_bufs=out_bufs, interpret=interpret,
            compute_dtype=compute_dtype,
            phase2_precision=phase2_precision,
        )

    if num_iterations == 1:
        return single(volume, 1)

    height, width, d_pad = volume.shape
    span_h = tile_h + 4 * _HALO
    span_w = tile_w + 4 * _HALO
    hp = max(_round_up(height, tile_h), _round_up(span_h, tile_h))
    wp = _round_up(width, tile_w)
    dp = _round_up(d_pad, tile_d)
    if wp < span_w:
        # too narrow for a double-haloed column tile
        return single(volume, num_iterations)

    pad_h, pad_w, pad_d = hp - height, wp - width, dp - d_pad
    n_chunks = dp // tile_d
    out_bufs = min(out_bufs, n_chunks)

    def pad2(plane, extra_rows=0, extra_cols=0):
        # leading shift = _HALO when extra is nonzero (module docstring)
        rshift = _HALO if extra_rows else 0
        cshift = _HALO if extra_cols else 0
        return jnp.pad(
            plane,
            ((rshift, pad_h + extra_rows - rshift),
             (cshift, pad_w + extra_cols - cshift)),
        )

    arm_l = arms.left.astype(jnp.int32)
    arm_r = arms.right.astype(jnp.int32)
    arm_u = arms.up.astype(jnp.int32)
    arm_d = arms.down.astype(jnp.int32)

    h_count = (pad2(arm_l) + pad2(arm_r) + 1).astype(jnp.float32)
    region_size = _arm_stencil_sum(
        h_count, pad2(arm_u), pad2(arm_d), axis=0,
        distance_threshold=distance_threshold,
    )
    inv_region = jnp.where(region_size > 0, 1.0 / region_size, 0.0)
    # un-pad back to the raw plane so the shifted variants re-pad cleanly
    inv_raw = inv_region[:height, :width]

    # Shifted plane variants (module docstring): _cs = +H cols,
    # _rs = +H rows, _rcs = both. Shift padding is zeros = zero arms /
    # zero 1/region at virtual pixels.
    a1l = pad2(arm_l, extra_cols=128)
    a1r = pad2(arm_r, extra_cols=128)
    a2u = pad2(arm_u, extra_rows=2 * _HALO, extra_cols=128)
    a2d = pad2(arm_d, extra_rows=2 * _HALO, extra_cols=128)
    a2inv = pad2(inv_raw, extra_rows=2 * _HALO, extra_cols=128)
    b1l = pad2(arm_l, extra_rows=2 * _HALO)
    b1r = pad2(arm_r, extra_rows=2 * _HALO)
    armu_p = pad2(arm_u)
    armd_p = pad2(arm_d)
    inv_p = inv_region

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
        _two_round_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_d=tile_d,
        n_chunks=n_chunks,
        out_bufs=out_bufs,
        rows_total=hp,
        cols_total=wp,
        compute_dtype=compute_dtype,
        phase2_precision=phase2_precision,
    )
    ah = tile_h + 2 * _HALO
    aw = tile_w + 2 * _HALO
    tile_block = pl.BlockSpec(
        (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    scratch_shapes = [
        pltpu.VMEM((2, span_h, span_w, tile_d), volume.dtype),   # windows
        pltpu.VMEM((span_h, span_w, aw), compute_dtype),         # A1 mask
        pltpu.VMEM((aw, span_h, ah), jnp.float32),               # A2 mask
        pltpu.VMEM((ah, aw, tile_w), compute_dtype),             # B1 mask
        pltpu.VMEM((tile_w, ah, tile_h), jnp.float32),           # B2 mask
        pltpu.VMEM((out_bufs, tile_h, tile_w, tile_d), volume.dtype),
        pltpu.VMEM((span_h, 256), jnp.int32),                    # a1l
        pltpu.VMEM((span_h, 256), jnp.int32),                    # a1r
        pltpu.VMEM((ah, 256), jnp.int32),                        # a2u
        pltpu.VMEM((ah, 256), jnp.int32),                        # a2d
        pltpu.VMEM((ah, 256), jnp.float32),                      # a2inv
        pltpu.VMEM((ah, tile_w), jnp.int32),                     # b1l
        pltpu.VMEM((ah, tile_w), jnp.int32),                     # b1r
        pltpu.SemaphoreType.DMA((7,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((out_bufs,)),
    ]

    call = pl.pallas_call(
        kernel,
        grid=(hp // tile_h, wp // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8
        + [tile_block, tile_block, tile_block],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((hp, wp, dp), volume.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # "arbitrary" pins the sequential row-major grid order the
            # cross-tile chunk-0 prefetch relies on
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    padded = jnp.pad(volume, ((0, pad_h), (0, pad_w), (0, pad_d)))

    def one_pass(_, vol):
        return call(
            vol, a1l, a1r, a2u, a2d, a2inv, b1l, b1r,
            armu_p, armd_p, inv_p,
        )

    out = lax.fori_loop(0, num_iterations // 2, one_pass, padded)
    out = out[:height, :width, :d_pad]
    if num_iterations % 2:
        out = single(out, 1)
    return out
