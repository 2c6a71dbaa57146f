"""Pallas TPU kernels: both cost-volume score bands in one pass.

For an output tile (TH rows, TW columns, TD disparities) the kernels stage
channel-major feature tiles plus (TW + TD)-wide context windows of the
opposite image in VMEM and compute

    left[h, w, d]  = <fL(h, w), fR(h, w - d)>
    right[h, w, d] = <fR(h, w), fL(h, w + d)>

Two implementations:
  * MXU (default): ONE row-batched (TH; TW x C @ C x TW+TD) correlation
    dot_general on the systolic array (f32 HIGHEST for f32 outputs; bf16
    outputs default to the 1-pass DEFAULT dot — they quantize to bf16 on
    the store anyway, and the kernel is dot-issue bound), then
    the band is read off the product's diagonals by skewing. BOTH bands
    read their context from a lane-REVERSED copy of the opposite feature
    array, which turns their increasing diagonals (slope +1, needing the
    stride -1 Mosaic lacks) into decreasing ones — extracted with a
    single hardware strided roll. The reversed right context additionally
    reverses the disparity order within the tile; one (TD, TD)
    anti-identity matmul on the MXU flips it back (exact — 0/1 matrix,
    f32 HIGHEST). This replaced the former log2(TW) ladder of masked
    uniform rolls on the right band (7 full-buffer rolls + selects per
    tile — the kernel's real bottleneck, not the dots).
    Exact to ~1e-5 of the f32 VPU path.
  * VPU (use_mxu=False): TD shifted multiply-reduce passes with W in the
    lane dimension. Measured 234 ms; kept as the bitwise-f32 path.

Either replaces (a) the XLA chunked (W, W) correlation whose banded
``take_along_axis`` extraction is a TPU gather (measured ~300 ms at
half-res) and (b) the catastrophic right-volume gather (measured ~6.4 s).

Out-of-range correspondences hit the zero padding and come out 0 — exactly
the pre-fill convention of the XLA path (cost_volume.py masks them the
same way before the border fills).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _band_kernel(
    fl_hbm,   # (Hp, C, Wpad) left features, channel-major, zero-padded W
    fr_hbm,   # (Hp, C, Wpad) right features
    out_l_ref,  # (TH, TD, TW)
    out_r_ref,  # (TH, TD, TW)
    fl_tile,    # scratch (TH, C, TW)
    fr_tile,    # scratch (TH, C, TW)
    fr_ctx,     # scratch (TH, C, TW + TD)
    fl_ctx,     # scratch (TH, C, TW + TD)
    sems,       # 4 DMA semaphores
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    d_total: int,
):
    i = pl.program_id(0)
    k = pl.program_id(1)  # disparity-tile index
    j = pl.program_id(2)  # column-tile index
    row0 = i * tile_h
    # all lane offsets are multiples of the 128 tiling by construction;
    # Mosaic needs the hint to admit the dynamic slices
    anchor0 = pl.multiple_of(j * tile_w + d_total, 128)
    left_ctx0 = pl.multiple_of(
        j * tile_w - k * tile_d + d_total - tile_d, 128
    )
    right_ctx0 = pl.multiple_of(j * tile_w + k * tile_d + d_total, 128)

    copies = [
        pltpu.make_async_copy(
            fl_hbm.at[pl.ds(row0, tile_h), :, pl.ds(anchor0, tile_w)],
            fl_tile, sems.at[0],
        ),
        pltpu.make_async_copy(
            fr_hbm.at[pl.ds(row0, tile_h), :, pl.ds(anchor0, tile_w)],
            fr_tile, sems.at[1],
        ),
        # fR context for the left band: real w in [w0-d0-TD, w0+TW)
        pltpu.make_async_copy(
            fr_hbm.at[pl.ds(row0, tile_h), :, pl.ds(left_ctx0, tile_w + tile_d)],
            fr_ctx, sems.at[2],
        ),
        # fL context for the right band: real w in [w0+d0, w0+d0+TW+TD)
        pltpu.make_async_copy(
            fl_hbm.at[pl.ds(row0, tile_h), :, pl.ds(right_ctx0, tile_w + tile_d)],
            fl_ctx, sems.at[3],
        ),
    ]
    for copy in copies:
        copy.start()
    for copy in copies:
        copy.wait()

    anchor_l = fl_tile[:, :, :]
    anchor_r = fr_tile[:, :, :]

    for v in range(tile_d):
        # disparity d = d0 + v; fR shifted right by d within the context
        shifted_r = fr_ctx[:, :, tile_d - v: tile_d - v + tile_w]
        out_l_ref[:, v, :] = jnp.sum(
            anchor_l * shifted_r, axis=1
        ).astype(out_l_ref.dtype)
        shifted_l = fl_ctx[:, :, v: v + tile_w]
        out_r_ref[:, v, :] = jnp.sum(
            anchor_r * shifted_l, axis=1
        ).astype(out_r_ref.dtype)


def _flip_lanes_mxu(band: jax.Array, tile_d: int,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """band[..., v] -> band[..., tile_d - 1 - v] via an anti-identity matmul.

    Mosaic has no lane ``rev``; a (TD, TD) 0/1 exchange-matrix dot on the
    MXU is exact in f32 HIGHEST and costs about as much as the correlation
    dot itself — far below the 7-masked-roll ladder it replaced. At
    DEFAULT precision (1 bf16 pass) the 0/1 matrix is still exact and the
    permuted values carry one bf16 quantization — free when the band is
    stored bf16 anyway (the fast schedules).
    """
    anti = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_d, tile_d), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (tile_d, tile_d), 1)
        == tile_d - 1
    ).astype(band.dtype)
    return jax.lax.dot_general(
        band, anti,
        dimension_numbers=(((band.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _skew_rows_neg(matrix: jax.Array, num_rows: int) -> jax.Array:
    """M'[..., u, k] = M[..., u, (k - u) mod L] — decreasing diagonals.

    Row-gated RIGHT rolls (gates depend only on the row index, which lane
    rolls never move, so the per-bit composition is exact). Reading the
    left band's decreasing diagonals this way — from a lane-REVERSED
    context (see ``band_pair_pallas``) — emits the band in natural
    disparity order: no reversed tile maps, no XLA-level flip copy of the
    whole volume afterwards.
    """
    # ONE hardware strided roll: right-roll by +u per second-minor index
    # u gives M[u, (k - u) mod L] directly. (The former log2 masked-roll
    # ladder was the band kernel's real bottleneck — 7 full-buffer rolls
    # per band — not the MXU dots.)
    del num_rows
    return pltpu.roll(
        matrix, 0, matrix.ndim - 1, stride=1, stride_axis=matrix.ndim - 2,
    )


def _finalize_tile(band: jax.Array, k, tile_d: int, ndisp: int | None,
                   dtype) -> jax.Array:
    """(TW, TD) f32 score tile -> stored cost tile.

    With ``ndisp`` set, applies the pipeline's volume convention in VMEM —
    cost = -score on real disparity lanes, BIG_COST on the padding lanes —
    so no full-volume select/negate buffer ever materializes at XLA level
    (at full-res that select was its own 5.74 GB allocation). The border
    fills commute with the negation (they are means), so running them on
    the finalized volume is bit-identical.
    """
    if ndisp is None:
        return band.astype(dtype)
    from mccnn_tpu.ops.common import BIG_COST

    lane = (
        jax.lax.broadcasted_iota(jnp.int32, band.shape, band.ndim - 1)
        + k * tile_d
    )
    return jnp.where(lane < ndisp, -band, BIG_COST).astype(dtype)


def _band_kernel_mxu(
    fl_hbm,   # (Hp, C, Wpad) left features, channel-major, zero-padded W
    fr_hbm,   # (Hp, C, Wpad)
    fl_rev_hbm,  # (Hp, C, Wpad) left features, W axis REVERSED
    fr_rev_hbm,  # (Hp, C, Wpad) right features, W axis REVERSED
    out_l_ref,  # (TH, TW, TD)
    out_r_ref,  # (TH, TW, TD)
    fl_tile,    # scratch (TH, C, TW)
    fr_tile,    # scratch (TH, C, TW)
    fr_ctx,     # scratch (TH, C, TW + TD) — from the REVERSED array
    fl_ctx,     # scratch (TH, C, TW + TD) — from the REVERSED array
    sems,
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    d_total: int,
    w_total: int,
    ndisp: int | None,
    precision,
):
    i = pl.program_id(0)
    k = pl.program_id(1)  # disparity-tile index
    j = pl.program_id(2)  # column-tile index
    grid_k = pl.num_programs(1)
    grid_j = pl.num_programs(2)
    g = (i * grid_k + k) * grid_j + j
    slot = jax.lax.rem(g, 2)

    def copies_at(buf, ti, tk, tj):
        row0 = ti * tile_h
        anchor0 = pl.multiple_of(tj * tile_w + d_total, 128)
        # left ctx covers fr cols [tj*TW - tk*TD + d_total - TD, .. +TW+TD);
        # in the reversed array that window starts at w_total - end
        left_ctx0 = tj * tile_w - tk * tile_d + d_total - tile_d
        left_ctx0_rev = pl.multiple_of(
            w_total - (tile_w + tile_d) - left_ctx0, 128
        )
        # right ctx covers fl cols [tj*TW + tk*TD + d_total, .. +TW+TD)
        right_ctx0 = tj * tile_w + tk * tile_d + d_total
        right_ctx0_rev = pl.multiple_of(
            w_total - (tile_w + tile_d) - right_ctx0, 128
        )
        return [
            pltpu.make_async_copy(
                fl_hbm.at[pl.ds(row0, tile_h), :, pl.ds(anchor0, tile_w)],
                fl_tile.at[buf], sems.at[buf, 0],
            ),
            pltpu.make_async_copy(
                fr_hbm.at[pl.ds(row0, tile_h), :, pl.ds(anchor0, tile_w)],
                fr_tile.at[buf], sems.at[buf, 1],
            ),
            pltpu.make_async_copy(
                fr_rev_hbm.at[pl.ds(row0, tile_h), :,
                              pl.ds(left_ctx0_rev, tile_w + tile_d)],
                fr_ctx.at[buf], sems.at[buf, 2],
            ),
            pltpu.make_async_copy(
                fl_rev_hbm.at[pl.ds(row0, tile_h), :,
                              pl.ds(right_ctx0_rev, tile_w + tile_d)],
                fl_ctx.at[buf], sems.at[buf, 3],
            ),
        ]

    @pl.when(g == 0)
    def _():
        for copy in copies_at(0, i, k, j):
            copy.start()

    # successor tile ids (row-major, j fastest), clamped in range; see
    # _band_kernel_mxu_one — cross-tile prefetch hides the window DMAs
    # under the predecessor tile's matmuls
    wrap_j = j + 1 >= grid_j
    nj = jnp.where(wrap_j, 0, j + 1)
    wrap_k = wrap_j & (k + 1 >= grid_k)
    nk = jnp.where(wrap_j, jnp.where(k + 1 >= grid_k, 0, k + 1), k)
    ni = jnp.minimum(jnp.where(wrap_k, i + 1, i), pl.num_programs(0) - 1)
    have_next = g + 1 < pl.num_programs(0) * grid_k * grid_j

    for own in (0, 1):
        @pl.when(slot == own)
        def _(own=own):
            for copy in copies_at(own, i, k, j):
                copy.wait()

            @pl.when(have_next)
            def _():
                for copy in copies_at(1 - own, ni, nk, nj):
                    copy.start()

    # corr[h, u, t] = <anchor[h, u], ctx[h, t]> on the MXU (contract
    # channels), ONE row-batched dot per tile — a per-row 2D-dot loop
    # bottoms out on Mosaic's per-instruction floor at ~2.4 Tflops
    corr_l = jax.lax.dot_general(
        fl_tile[slot], fr_ctx[slot],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TH, TW, TW + TD); reversed ctx: col t = fr[...hi - t]
    corr_r = jax.lax.dot_general(
        fr_tile[slot], fl_ctx[slot],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # left band: out[u, v] = <fL(u), fR(u - v)> sits at corr_l col
    # t = TW - 1 - u + v. One uniform roll (t' = t + 1) plus the
    # decreasing-diagonal skew puts it at lane TW + v — an aligned
    # static slice, in NATURAL disparity order (no flip anywhere).
    skewed_l = _skew_rows_neg(pltpu.roll(corr_l, 1, axis=2), tile_w)
    out_l_ref[:, :, :] = _finalize_tile(
        skewed_l[:, :, tile_w: tile_w + tile_d], k, tile_d, ndisp,
        out_l_ref.dtype,
    )
    # right band: out[u, v] = <fR(u), fL(u + v)> sits at corr_r col
    # t = TW + TD - 1 - u - v (reversed ctx) — decreasing diagonals, so
    # the same single strided roll applies; the band lands at aligned
    # lanes [TW, TW + TD) with v REVERSED, un-reversed by the
    # anti-identity matmul (see _flip_lanes_mxu).
    skewed_r = _skew_rows_neg(corr_r, tile_w)
    band_r = _flip_lanes_mxu(
        skewed_r[:, :, tile_w: tile_w + tile_d], tile_d
    )
    out_r_ref[:, :, :] = _finalize_tile(
        band_r, k, tile_d, ndisp, out_r_ref.dtype,
    )


def _band_kernel_mxu_one(
    anchor_hbm,  # (Hp, C, Wpad) anchor features, channel-major
    ctx_hbm,     # (Hp, C, Wpad) context features, W axis REVERSED
    out_ref,  # (TH, TW, TD)
    anchor_tile,  # scratch (2, TH, C, TW) — double-buffered
    ctx_tile,     # scratch (2, TH, C, TW + TD)
    sems,
    *,
    tile_h: int,
    tile_w: int,
    tile_d: int,
    d_total: int,
    w_total: int,
    ndisp: int | None,
    side: str,
    precision,
):
    """Single-band variant of ``_band_kernel_mxu``: half the DMA traffic,
    matmuls, and output writes — used when the pipeline builds one volume
    at a time to halve peak HBM (the full-resolution schedule).

    Cross-tile prefetch: each grid step starts the NEXT tile's anchor/ctx
    window DMAs (into the other buffer slot) before computing, so the
    fetch rides under this tile's matmuls instead of serializing with
    them — the same pattern as the fused CBCA kernel's chunk-0 prefetch.
    The serialized start->wait per tile left the whole DMA latency on the
    critical path of every one of the (H/TH)(D/TD)(W/TW) tiles. Requires
    the sequential row-major grid ("arbitrary" dimension semantics)."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)
    grid_k = pl.num_programs(1)
    grid_j = pl.num_programs(2)
    g = (i * grid_k + k) * grid_j + j
    slot = jax.lax.rem(g, 2)

    def copies_at(buf, ti, tk, tj):
        row0 = ti * tile_h
        anchor0 = pl.multiple_of(tj * tile_w + d_total, 128)
        if side == "left":
            ctx0 = pl.multiple_of(
                w_total - (tile_w + tile_d)
                - (tj * tile_w - tk * tile_d + d_total - tile_d),
                128,
            )
        else:
            ctx0 = pl.multiple_of(
                w_total - (tile_w + tile_d)
                - (tj * tile_w + tk * tile_d + d_total),
                128,
            )
        return [
            pltpu.make_async_copy(
                anchor_hbm.at[pl.ds(row0, tile_h), :,
                              pl.ds(anchor0, tile_w)],
                anchor_tile.at[buf], sems.at[buf, 0],
            ),
            pltpu.make_async_copy(
                ctx_hbm.at[pl.ds(row0, tile_h), :,
                           pl.ds(ctx0, tile_w + tile_d)],
                ctx_tile.at[buf], sems.at[buf, 1],
            ),
        ]

    @pl.when(g == 0)
    def _():
        for copy in copies_at(0, i, k, j):
            copy.start()

    # successor tile ids in row-major grid order (j fastest), clamped so
    # the (suppressed) last-step descriptors stay in range
    wrap_j = j + 1 >= grid_j
    nj = jnp.where(wrap_j, 0, j + 1)
    wrap_k = wrap_j & (k + 1 >= grid_k)
    nk = jnp.where(wrap_j, jnp.where(k + 1 >= grid_k, 0, k + 1), k)
    ni = jnp.minimum(jnp.where(wrap_k, i + 1, i), pl.num_programs(0) - 1)
    have_next = g + 1 < pl.num_programs(0) * grid_k * grid_j

    # literal buffer indices per parity branch (traced .at[slot] DMA
    # descriptors hang the Mosaic compiler — see CLAUDE.md / cbca_fused)
    for own in (0, 1):
        @pl.when(slot == own)
        def _(own=own):
            for copy in copies_at(own, i, k, j):
                copy.wait()

            @pl.when(have_next)
            def _():
                for copy in copies_at(1 - own, ni, nk, nj):
                    copy.start()

    corr = jax.lax.dot_general(
        anchor_tile[slot], ctx_tile[slot],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TH, TW, TW + TD) — one row-batched dot (see _band_kernel_mxu)
    if side == "left":
        # reversed ctx + decreasing-diagonal skew: natural d order
        skewed = _skew_rows_neg(pltpu.roll(corr, 1, axis=2), tile_w)
        band = skewed[:, :, tile_w: tile_w + tile_d]
    else:
        # reversed ctx: band at lanes [TW, TW+TD) in reversed d order
        skewed = _skew_rows_neg(corr, tile_w)
        band = _flip_lanes_mxu(
            skewed[:, :, tile_w: tile_w + tile_d], tile_d,
            precision=precision,
        )
    out_ref[:, :, :] = _finalize_tile(band, k, tile_d, ndisp, out_ref.dtype)


def band_pair_pallas(
    features_left: jax.Array,
    features_right: jax.Array,
    d_pad: int,
    tile_h: int = 32,  # th8 -> 16 measured: full-res side 144 -> 126.5 ms,
    #                    half-res pair 36.3 -> 35.2 (fewer per-tile DMA
    #                    waits); th16 -> 32 with bf16 feature DMA:
    #                    full-width side 57.8 -> 53.0 ms, half-res side
    #                    20.6 -> 19.7 (isolated, H=1000 proxies)
    tile_w: int = 128,
    tile_d: int = 128,
    interpret: bool | None = None,
    use_mxu: bool = True,
    sides: str = "both",
    out_dtype=None,
    finalize_ndisp: int | None = None,
    precision=None,
) -> Tuple[jax.Array, jax.Array] | jax.Array:
    """(H, W, C) feature pair -> (left, right) score bands (H, W, d_pad).

    Out-of-range entries are 0; no border fills (cost_volume
    .cost_volume_pair applies those). ``use_mxu`` selects the
    matmul+strided-roll-skew kernel (default; the systolic array does the
    dots) over the shifted multiply-reduce VPU kernel. ``sides`` = "both" returns
    the tuple; "left"/"right" computes and returns only that band (half the
    work and peak memory — the full-res schedule). ``out_dtype`` casts the
    band inside the kernel (bf16 volumes never materialize in f32).

    ``finalize_ndisp`` (MXU kernels only): emit pipeline cost volumes
    directly — negated scores with BIG_COST disparity-pad lanes — so the
    wrapper returns with NO epilogue ops on the volume at all. Both bands
    read their context from a once-flipped copy of the opposite feature
    array and extract decreasing diagonals (``_skew_rows_neg``): the left
    band comes out in natural disparity order directly; the right band
    comes out d-reversed within the tile and is flipped back by the
    ``_flip_lanes_mxu`` anti-identity matmul. No reversed tile maps, no
    XLA-level flips (a full extra volume copy at full-res), no masked
    roll ladders.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if finalize_ndisp is not None and not use_mxu:
        raise ValueError("finalize_ndisp requires the MXU kernels")
    out_dtype = out_dtype or features_left.dtype
    if isinstance(precision, str):
        precision = jax.lax.Precision[precision.upper()]
    if precision is None:
        # bf16-stored bands quantize to bf16 on write anyway: the 1-pass
        # DEFAULT dot is the same numerics class at 1/6 the MXU issue
        # slots (the kernel is dot-issue bound — see BASELINE.md). f32
        # bands keep the exact 6-pass HIGHEST correlation.
        precision = (
            jax.lax.Precision.DEFAULT
            if jnp.dtype(out_dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
    if (
        precision == jax.lax.Precision.DEFAULT
        and features_left.dtype == jnp.float32
        and use_mxu
    ):
        # the 1-pass DEFAULT dot rounds each f32 operand to bf16 anyway, so
        # pre-cast features are BIT-IDENTICAL through the correlation while
        # halving the kernel's feature DMA traffic (the full-res band is
        # partly DMA-bound: ~18 GB of f32 feature reads per side)
        features_left = features_left.astype(jnp.bfloat16)
        features_right = features_right.astype(jnp.bfloat16)
    height, width, channels = features_left.shape
    d_total = _round_up(d_pad, tile_d)
    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    cp = _round_up(channels, 8)  # channel axis is sublane-tiled
    w_total = wp + 2 * d_total  # padded W extent of the prepped arrays

    def prep(f, reverse=False):
        f = jnp.transpose(f, (0, 2, 1))  # (H, C, W)
        f = jnp.pad(
            f,
            ((0, hp - height), (0, cp - channels),
             (d_total, d_total + wp - width)),
        )
        return jnp.flip(f, axis=2) if reverse else f

    grid = (hp // tile_h, d_total // tile_d, wp // tile_w)

    def crop(out):
        return out[:height, :width, :d_pad]

    if sides != "both":
        if not use_mxu:
            raise ValueError("single-side bands require the MXU kernel")
        if sides == "left":
            anchor = prep(features_left)
            ctx = prep(features_right, reverse=True)
        else:
            anchor = prep(features_right)
            ctx = prep(features_left, reverse=True)
        kernel = functools.partial(
            _band_kernel_mxu_one,
            tile_h=tile_h, tile_w=tile_w, tile_d=tile_d, d_total=d_total,
            w_total=w_total, ndisp=finalize_ndisp, side=sides,
            precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tile_h, tile_w, tile_d), lambda i, k, j: (i, j, k),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((hp, wp, d_total), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h, cp, tile_w), features_left.dtype),
                pltpu.VMEM((2, tile_h, cp, tile_w + tile_d),
                           features_left.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                # "arbitrary" pins the sequential row-major grid order the
                # cross-tile prefetch relies on
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(anchor, ctx)
        return crop(out)

    fl = prep(features_left)
    fr = prep(features_right)
    if use_mxu:
        fl_rev = prep(features_left, reverse=True)
        fr_rev = prep(features_right, reverse=True)
        kernel = functools.partial(
            _band_kernel_mxu,
            tile_h=tile_h, tile_w=tile_w, tile_d=tile_d, d_total=d_total,
            w_total=w_total, ndisp=finalize_ndisp,
            precision=precision,
        )
        out_shape = jax.ShapeDtypeStruct((hp, wp, d_total), out_dtype)
        out_l_spec = out_r_spec = pl.BlockSpec(
            (tile_h, tile_w, tile_d), lambda i, k, j: (i, j, k),
            memory_space=pltpu.VMEM,
        )
        out_l, out_r = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(out_l_spec, out_r_spec),
            out_shape=(out_shape, out_shape),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h, cp, tile_w), features_left.dtype),
                pltpu.VMEM((2, tile_h, cp, tile_w), features_left.dtype),
                pltpu.VMEM((2, tile_h, cp, tile_w + tile_d),
                           features_left.dtype),
                pltpu.VMEM((2, tile_h, cp, tile_w + tile_d),
                           features_left.dtype),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(fl, fr, fl_rev, fr_rev)
        return crop(out_l), crop(out_r)

    kernel = functools.partial(
        _band_kernel,
        tile_h=tile_h, tile_w=tile_w, tile_d=tile_d, d_total=d_total,
    )
    out_shape = jax.ShapeDtypeStruct((hp, d_total, wp), out_dtype)
    out_spec = pl.BlockSpec(
        (tile_h, tile_d, tile_w), lambda i, k, j: (i, k, j),
        memory_space=pltpu.VMEM,
    )
    out_l, out_r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_h, cp, tile_w), features_left.dtype),
            pltpu.VMEM((tile_h, cp, tile_w), features_left.dtype),
            pltpu.VMEM((tile_h, cp, tile_w + tile_d), features_left.dtype),
            pltpu.VMEM((tile_h, cp, tile_w + tile_d), features_left.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(fl, fr)
    # VPU kernel emits (H, D, W) -> the pipeline's (H, W, D)
    out_l = jnp.transpose(out_l, (0, 2, 1))[:height, :width, :d_pad]
    out_r = jnp.transpose(out_r, (0, 2, 1))[:height, :width, :d_pad]
    return out_l, out_r
