"""Disparity cost-volume construction.

Behavioral spec (reference: src/process_functional.py:78-113):
  * ``cost[h, w, d] = -<fL(h, w), fR(h, w-d)>`` over 64-d unit descriptors.
  * Left-volume entries with ``w < d`` have no correspondence; column ``d-1``
    is filled (descending d, sequentially) with the mean of the <=3 nearest
    valid columns for disparities ``>= d``.
  * The right volume is the left volume's valid band shifted
    (``rcv[h, w, d] = lcv[h, w+d, d]``), with a mirrored border fill on the
    right edge.

TPU design: instead of the reference's per-disparity Python shift-and-dot
loop, the score bands are produced by
  * method="pallas" (TPU default): the Pallas MXU band kernel — per-row
    correlation matmuls with log-skew diagonal extraction, emitting both
    bands in one pass (see ops/cost_volume_pallas.py);
  * method="matmul": XLA row-block (W, W) correlation matmuls with a
    banded take_along_axis (portable; the gather is slow on TPU);
  * method="rolldot": a roll-and-reduce scan (exact f32 VPU math, used for
    parity tests and tiny shapes).
Volumes are ``(H, W, D)`` with D padded to a lane multiple; padded entries
hold the ``BIG_COST`` sentinel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mccnn_tpu.ops.common import (
    BIG_COST,
    column_iota,
    disparity_iota,
    pad_disparities,
)

__all__ = ["cost_volume_pair", "pad_disparities"]


def cost_volume_pair(
    features_left: jax.Array,
    features_right: jax.Array,
    ndisp: int,
    d_pad: int | None = None,
    method: str = "matmul",
    row_chunk: int = 8,
    sides: str = "both",
    dtype=None,
) -> Tuple[jax.Array, jax.Array] | jax.Array:
    """Build the (left, right) cost volumes, border-filled and +inf-padded.

    Args:
      features_left/right: (H, W, C) descriptor fields.
      ndisp: number of real disparities (static).
      d_pad: padded disparity depth (defaults to ndisp rounded to 128).
      method: "matmul" (MXU row-block correlation) or "rolldot" (VPU scan).
      row_chunk: rows per correlation matmul block for method="matmul".
      sides: "both" (return tuple) or "left"/"right" — build only one
        volume (the full-resolution schedule keeps at most one alive).
      dtype: volume storage dtype (default float32; bfloat16 is the
        full-resolution memory mode — the Pallas kernel casts in VMEM so
        no f32 volume ever materializes).

    Returns:
      (left, right) volumes — or one of them — of shape (H, W, d_pad);
      entries at d >= ndisp hold BIG_COST.
    """
    height, width, _ = features_left.shape
    if ndisp > width:
        raise ValueError(f"ndisp ({ndisp}) must be <= image width ({width})")
    if d_pad is None:
        d_pad = pad_disparities(ndisp)
    dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32

    wgrid = column_iota(width)
    dgrid = disparity_iota(d_pad)
    pad_lanes = dgrid < ndisp

    scores_left = scores_right = None
    if method == "pallas":
        from mccnn_tpu.ops.cost_volume_pallas import band_pair_pallas

        # the MXU kernels emit finalized volumes (cost = -score, BIG_COST
        # pad lanes) directly in VMEM; the border fills are means, which
        # commute with the negation bit-exactly, so they run on the
        # finalized volume. No epilogue select/negate buffer materializes.
        if sides == "both":
            vol_l, vol_r = band_pair_pallas(
                features_left, features_right, d_pad, out_dtype=dtype,
                finalize_ndisp=ndisp,
            )
            return (_border_fill_left(vol_l, ndisp),
                    _border_fill_right(vol_r, ndisp))
        vol = band_pair_pallas(features_left, features_right, d_pad,
                               sides=sides, out_dtype=dtype,
                               finalize_ndisp=ndisp)
        if sides == "left":
            return _border_fill_left(vol, ndisp)
        return _border_fill_right(vol, ndisp)
    else:
        if method == "matmul":
            scores_left = _left_scores_matmul(
                features_left, features_right, d_pad, row_chunk
            )
        elif method == "rolldot":
            scores_left = _left_scores_rolldot(
                features_left, features_right, d_pad
            )
        else:
            raise ValueError(f"unknown cost-volume method: {method}")

        # zero the w < d band and the disparity padding before the fills
        valid = (wgrid >= dgrid) & pad_lanes
        scores_left = jnp.where(valid, scores_left, 0.0).astype(dtype)
        if sides != "left":
            scores_right = _right_from_left(scores_left, ndisp)
        if sides == "right":
            scores_left = None

    big = jnp.asarray(BIG_COST, dtype)
    if scores_left is not None:
        scores_left = _border_fill_left(scores_left, ndisp)
        left = jnp.where(pad_lanes, -scores_left, big)
        if sides == "left":
            return left
    if scores_right is not None:
        scores_right = _border_fill_right(scores_right, ndisp)
        right = jnp.where(pad_lanes, -scores_right, big)
        if sides == "right":
            return right
    return left, right


def _left_scores_rolldot(
    features_left: jax.Array, features_right: jax.Array, d_pad: int
) -> jax.Array:
    """Scores via per-disparity shifted dot products (exact f32, VPU)."""
    height, width, _ = features_left.shape

    def step(volume, d):
        shifted = jnp.roll(features_right, d, axis=1)
        dots = jnp.sum(features_left * shifted, axis=-1)
        return lax.dynamic_update_index_in_dim(volume, dots, d, axis=2), None

    init = jnp.zeros((height, width, d_pad), dtype=jnp.float32)
    volume, _ = lax.scan(step, init, jnp.arange(d_pad, dtype=jnp.int32))
    return volume


def _left_scores_matmul(
    features_left: jax.Array,
    features_right: jax.Array,
    d_pad: int,
    row_chunk: int,
) -> jax.Array:
    """Scores via MXU row-block correlation + banded gather.

    For each block of rows, computes the full (W, W) correlation matrix
    ``fL[h] @ fR[h]^T`` on the MXU (f32 via highest-precision passes) and
    gathers the diagonal band ``scores[w, d] = corr[w, w - d]``.
    """
    height, width, _ = features_left.shape
    pad_rows = (-height) % row_chunk
    fl = jnp.pad(features_left, ((0, pad_rows), (0, 0), (0, 0)))
    fr = jnp.pad(features_right, ((0, pad_rows), (0, 0), (0, 0)))
    num_chunks = fl.shape[0] // row_chunk
    fl = fl.reshape(num_chunks, row_chunk, width, -1)
    fr = fr.reshape(num_chunks, row_chunk, width, -1)

    wgrid = jnp.arange(width, dtype=jnp.int32)[:, None]
    dgrid = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    band_idx = jnp.clip(wgrid - dgrid, 0, width - 1)  # (W, D)

    def chunk_scores(chunk):
        fl_chunk, fr_chunk = chunk
        corr = jnp.einsum(
            "hwc,hvc->hwv",
            fl_chunk,
            fr_chunk,
            precision=lax.Precision.HIGHEST,
        )
        return jnp.take_along_axis(corr, band_idx[None], axis=2)

    scores = lax.map(chunk_scores, (fl, fr))
    scores = scores.reshape(num_chunks * row_chunk, width, d_pad)
    return scores[:height]


def _right_from_left(scores_left: jax.Array, ndisp: int) -> jax.Array:
    """rcv[h, w, d] = lcv[h, w+d, d] for w+d < W, else 0.

    (The dot product is symmetric, so the right volume is a shift of the
    left one — reference: src/process_functional.py:100-106.)
    """
    height, width, d_pad = scores_left.shape
    wgrid = column_iota(width)
    dgrid = disparity_iota(d_pad)
    src = jnp.clip(wgrid + dgrid, 0, width - 1)  # (1, W, D)
    gathered = jnp.take_along_axis(scores_left, jnp.broadcast_to(
        src, (height, width, d_pad)), axis=1)
    valid = (wgrid + dgrid < width) & (dgrid < ndisp)
    return jnp.where(valid, gathered, 0.0)


def _masked_mean3(cols: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over the valid subset of 3 gathered columns (H, 3, D)."""
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    total = jnp.sum(
        jnp.where(valid[None, :, None], cols, 0.0), axis=1
    )
    return total / count


def _border_fill_left(scores: jax.Array, ndisp: int, chunk: int = 8) -> jax.Array:
    """Fill the no-correspondence band of the left volume.

    Sequentially for d = ndisp-1 .. 1: column d-1 gets, for disparities
    >= d, the mean of columns d..d+2 (clipped at the image edge) — columns
    that may themselves have been filled by earlier steps
    (reference: src/process_functional.py:94-95). The scan carries a
    once-padded volume and processes ``chunk`` fill steps per iteration on
    a local (H, chunk+3, D) block (one-step scans idle on loop overhead).
    """
    if ndisp < 2:
        return scores
    height, width, d_pad = scores.shape
    dgrid = disparity_iota(d_pad)[0]  # (1, D)
    # the highest fill step (d = ndisp-1) reads columns ndisp-1..ndisp+1;
    # only tiny widths need the guard columns — padding unconditionally
    # would copy the whole volume (5.9 GB at full-res) twice (pad + crop)
    pad_n = 0 if width >= ndisp + 2 else 2
    padded = jnp.pad(scores, ((0, 0), (0, pad_n), (0, 0))) if pad_n else scores

    def fill_one(block, local, d):
        """block cols [base, base+size): write local, read local+1..+3."""
        cols = lax.dynamic_slice_in_dim(block, local + 1, 3, axis=1)
        valid = d + jnp.arange(3, dtype=jnp.int32) < width
        mean = _masked_mean3(cols, valid)
        old = lax.index_in_dim(block, local, axis=1, keepdims=False)
        # real disparity lanes only: the finalized-volume path (pallas)
        # carries BIG_COST pad lanes through the fills bit-exactly
        new_col = jnp.where((dgrid >= d) & (dgrid < ndisp), mean,
                            old).astype(block.dtype)
        return lax.dynamic_update_index_in_dim(block, new_col, local, axis=1)

    total = ndisp - 1  # fill steps, d = ndisp-1 .. 1
    remainder = total % chunk
    volume = padded
    d = ndisp - 1
    for _ in range(remainder):  # static prologue
        volume = fill_one(volume, d - 1, jnp.int32(d))
        d -= 1

    def step(volume, d_hi):
        # this chunk fills d = d_hi .. d_hi-chunk+1 -> columns base..base+K-1
        base = d_hi - chunk  # lowest written column (d_hi - chunk + 1) - 1
        block = lax.dynamic_slice(volume, (0, base, 0),
                                  (height, chunk + 3, d_pad))
        for j in range(chunk):
            block = fill_one(block, chunk - 1 - j, d_hi - j)
        return lax.dynamic_update_slice(volume, block, (0, base, 0)), None

    if d >= 1:
        starts = jnp.arange(d, 0, -chunk, dtype=jnp.int32)
        volume, _ = lax.scan(step, volume, starts)
    return volume[:, :width, :] if pad_n else volume


def _border_fill_right(scores: jax.Array, ndisp: int, chunk: int = 8) -> jax.Array:
    """Mirrored border fill for the right volume.

    Sequentially for d = ndisp-1 .. 1: column W-d gets, for disparities
    >= d, the mean of columns W-d-3..W-d-1
    (reference: src/process_functional.py:105-106).
    """
    if ndisp < 2:
        return scores
    height, width, d_pad = scores.shape
    dgrid = disparity_iota(d_pad)[0]  # (1, D)
    # the deepest read column is W - ndisp - 2; pad only when it's negative
    pad_n = 0 if width >= ndisp + 2 else 3
    padded = jnp.pad(scores, ((0, 0), (pad_n, 0), (0, 0))) if pad_n else scores

    def fill_one(block, local, d):
        """write local col (= padded W-d+3 within block), read local-3..-1."""
        cols = lax.dynamic_slice_in_dim(block, local - 3, 3, axis=1)
        valid = width - d - 3 + jnp.arange(3, dtype=jnp.int32) >= 0
        mean = _masked_mean3(cols, valid)
        old = lax.index_in_dim(block, local, axis=1, keepdims=False)
        # real disparity lanes only: the finalized-volume path (pallas)
        # carries BIG_COST pad lanes through the fills bit-exactly
        new_col = jnp.where((dgrid >= d) & (dgrid < ndisp), mean,
                            old).astype(block.dtype)
        return lax.dynamic_update_index_in_dim(block, new_col, local, axis=1)

    total = ndisp - 1
    remainder = total % chunk
    volume = padded
    d = ndisp - 1
    for _ in range(remainder):  # static prologue
        volume = fill_one(volume, width - d + pad_n, jnp.int32(d))
        d -= 1

    def step(volume, d_hi):
        # fills d = d_hi .. d_hi-chunk+1 -> cols (W-d_hi+pad_n)..(+K-1)
        base = width - d_hi - 3 + pad_n  # 3 read-context cols lead the write
        block = lax.dynamic_slice(volume, (0, base, 0),
                                  (height, chunk + 3, d_pad))
        for j in range(chunk):
            block = fill_one(block, 3 + j, d_hi - j)
        return lax.dynamic_update_slice(volume, block, (0, base, 0)), None

    if d >= 1:
        starts = jnp.arange(d, 0, -chunk, dtype=jnp.int32)
        volume, _ = lax.scan(step, volume, starts)
    return volume[:, pad_n:, :] if pad_n else volume
