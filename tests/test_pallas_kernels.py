"""Pallas kernels vs the XLA reference paths (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.ops.cbca import cbca, compute_arms
from mccnn_tpu.ops.cbca_pallas import cbca_pallas
from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.ops.cost_volume import cost_volume_pair
from mccnn_tpu.ops.cost_volume_pallas import band_pair_pallas


def _unit_features(rng, height, width, channels=8):
    f = rng.normal(size=(height, width, channels)).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


def test_band_pair_matches_direct_dots(rng):
    height, width, d_pad = 6, 20, 8
    fl = _unit_features(rng, height, width)
    fr = _unit_features(rng, height, width)
    left, right = band_pair_pallas(
        jnp.asarray(fl), jnp.asarray(fr), d_pad,
        tile_h=2, tile_w=8, tile_d=4, interpret=True,
    )
    left, right = np.asarray(left), np.asarray(right)
    assert left.shape == (height, width, d_pad)
    for w in range(width):
        for d in range(d_pad):
            exp_l = (
                np.sum(fl[:, w] * fr[:, w - d], axis=-1) if w - d >= 0 else 0.0
            )
            np.testing.assert_allclose(left[:, w, d], exp_l, atol=1e-5)
            exp_r = (
                np.sum(fr[:, w] * fl[:, w + d], axis=-1)
                if w + d < width else 0.0
            )
            np.testing.assert_allclose(right[:, w, d], exp_r, atol=1e-5)


def test_cost_volume_pallas_method_matches_matmul(rng):
    height, width, ndisp = 5, 24, 6
    fl = jnp.asarray(_unit_features(rng, height, width))
    fr = jnp.asarray(_unit_features(rng, height, width))
    left_a, right_a = cost_volume_pair(fl, fr, ndisp, d_pad=8, method="matmul")
    left_b, right_b = cost_volume_pair(fl, fr, ndisp, d_pad=8, method="pallas")
    np.testing.assert_allclose(np.asarray(left_a), np.asarray(left_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(right_a), np.asarray(right_b), atol=1e-5)


@pytest.mark.parametrize("iterations", [1, 2])
def test_cbca_pallas_matches_xla(rng, iterations):
    height, width, ndisp = 10, 12, 5
    d_pad = 8
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau, dist = 0.8, 4

    arms = compute_arms(jnp.asarray(image), tau, dist)
    expected = cbca(jnp.asarray(volume), arms, iterations, dist)
    ours = cbca_pallas(
        jnp.asarray(volume), arms, iterations, dist,
        tile_h=4, tile_w=8, tile_d=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(expected), rtol=1e-4, atol=1e-4
    )


def test_cbca_mxu_matches_exact_within_bf16(rng):
    from mccnn_tpu.ops.cbca_mxu import cbca_mxu

    height, width, ndisp = 12, 16, 5
    d_pad = 8
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 4)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, 2, 4))
    fast = np.asarray(cbca_mxu(jnp.asarray(volume), arms, 2, 4))
    # bf16 quantization of the volume per stage: ~0.4% relative per round
    real = exact[:, :, :ndisp]
    np.testing.assert_allclose(fast[:, :, :ndisp], real, rtol=0.05, atol=0.05)
    assert np.all(fast[:, :, ndisp:] > 0.5 * BIG_COST)


@pytest.mark.parametrize("tile_h", [16, 32])
@pytest.mark.parametrize("iterations,dist", [(1, 14), (2, 4)])
def test_cbca_fused_matches_xla(rng, iterations, dist, tile_h):
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    # big enough that the kernel path (not the tiny-shape fallback) runs
    # for every tile_h, non-multiples of the tiles so clamped border
    # blocks (row_off/col_off folded into the masks) are exercised
    height, width, ndisp = 100, 150, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    tau = 0.8
    arms = compute_arms(jnp.asarray(image), tau, dist)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, iterations, dist))
    ours = np.asarray(
        cbca_fused(jnp.asarray(volume), arms, iterations, dist,
                   interpret=True, tile_h=tile_h)
    )
    assert ours.shape == volume.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)


def test_cbca_fused_dsplit_layout_matches_xla(rng):
    """dsplit stores the volume (D/tile_d, H, W, tile_d) between rounds;
    D=256/td=128 gives n_chunks=2 so the per-chunk window/out DMAs hit the
    rank-4 indexing path, and the entry/exit transposes must round-trip."""
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    height, width, ndisp = 100, 150, 5
    d_pad = 256
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, 2, 14))
    ours = np.asarray(
        cbca_fused(jnp.asarray(volume), arms, 2, 14,
                   interpret=True, tile_h=32, dsplit=True)
    )
    assert ours.shape == volume.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)


def test_cbca_fused_int8_matches_xla_sim(rng):
    """int8-storage mode is exact integer math: the kernel (i8 mask x i8
    window -> i32 phase 1, f32 HIGHEST phase 2, round-half-even store)
    must equal the XLA simulation BIT-FOR-BIT (both compute
    round(sum(q) * inv_region) on exact integer f32 sums), preserve
    BIG_COST pad lanes exactly, and sit within ~1 quantization step per
    round of the exact aggregation."""
    from mccnn_tpu.ops.cbca_fused import cbca_fused, cbca_int8_xla

    height, width, ndisp, d_pad = 100, 150, 5, 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)
    iterations = 2

    ours = np.asarray(cbca_fused(jnp.asarray(volume), arms, iterations, 14,
                                 interpret=True, tile_h=32,
                                 int8_storage=True))
    sim = np.asarray(cbca_int8_xla(jnp.asarray(volume), arms, iterations, 14))
    np.testing.assert_array_equal(ours, sim)
    assert np.all(ours[:, :, ndisp:] == BIG_COST)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, iterations, 14))
    step = 2 * np.abs(volume[:, :, :ndisp]).max() / 252
    err = np.abs(ours[:, :, :ndisp] - exact[:, :, :ndisp]).max()
    assert err <= (iterations + 0.6) * step, (err, step)


def test_cbca_fused_int8_raw_mode_stays_int8(rng):
    """Pre-quantized i8 input (the sharded wrapper's global-scale path)
    runs raw integer rounds and returns i8."""
    from mccnn_tpu.ops.cbca_fused import (
        _dequantize_int8,
        _quantize_int8,
        cbca_fused,
        cbca_int8_xla,
    )

    height, width, ndisp, d_pad = 100, 150, 5, 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    q, scale = _quantize_int8(jnp.asarray(volume))
    raw = cbca_fused(q, arms, 2, 14, interpret=True, tile_h=32,
                     int8_storage=True)
    assert raw.dtype == jnp.int8
    via_raw = np.asarray(_dequantize_int8(raw, scale, jnp.float32))
    whole = np.asarray(cbca_int8_xla(jnp.asarray(volume), arms, 2, 14))
    np.testing.assert_array_equal(via_raw, whole)


def test_cbca_fused_bf16_matches_f32_within_tolerance(rng):
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    height, width, ndisp = 100, 150, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, 2, 14))
    fast = np.asarray(
        cbca_fused(
            jnp.asarray(volume).astype(jnp.bfloat16), arms, 2, 14,
            interpret=True,
        )
    ).astype(np.float32)
    # one bf16 quantization of the volume per round (mid sums stay f32)
    np.testing.assert_allclose(
        fast[:, :, :ndisp], exact[:, :, :ndisp], rtol=0.05, atol=0.05
    )
    assert np.all(fast[:, :, ndisp:] > 0.5 * BIG_COST)


def test_cbca_fused_mixed_precision_matches_f32_within_tolerance(rng):
    """cbca_impl="fused16": f32 storage, bf16 phase-1 multiplies."""
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    height, width, ndisp = 100, 150, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, 2, 14))
    fast = np.asarray(
        cbca_fused(jnp.asarray(volume), arms, 2, 14, interpret=True,
                   compute_dtype=jnp.bfloat16)
    )
    assert fast.dtype == np.float32  # storage dtype is preserved
    # one bf16 quantization of the multiplicands per round
    np.testing.assert_allclose(
        fast[:, :, :ndisp], exact[:, :, :ndisp], rtol=0.05, atol=0.05
    )
    assert np.all(fast[:, :, ndisp:] > 0.5 * BIG_COST)


@pytest.mark.parametrize(
    "iterations,dist,tile_h",
    [(1, 14, 32), (2, 4, 32), (1, 14, 64)],
)
def test_cbca_rolling_matches_xla(rng, iterations, dist, tile_h):
    """Rolling-row fused CBCA == exact stencil up to f32 accumulation order.

    Non-multiple-of-tile H/W so the padded pair-block tail (zero-arm rows,
    gated subC/subD DMAs) and clamped column tiles are exercised. tile_h=64
    makes H=100 pad to one 128-row pair-block where the zeroed ring gap
    [TH+SUB, ring-HALO) is non-empty (at tile_h=32 that gap is empty and
    the widened-zeroing path never runs).
    """
    from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

    height, width, ndisp = 100, 150, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, dist)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, iterations, dist))
    ours = np.asarray(
        cbca_fused_rolling(jnp.asarray(volume), arms, iterations, dist,
                           interpret=True, tile_h=tile_h)
    )
    assert ours.shape == volume.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("tile_h", [32, 64])
def test_cbca_rolling_bf16_matches_f32_within_tolerance(rng, tile_h):
    from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

    height, width, ndisp = 100, 150, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, 2, 14))
    fast = np.asarray(
        cbca_fused_rolling(
            jnp.asarray(volume).astype(jnp.bfloat16), arms, 2, 14,
            interpret=True, tile_h=tile_h,
        )
    ).astype(np.float32)
    np.testing.assert_allclose(
        fast[:, :, :ndisp], exact[:, :, :ndisp], rtol=0.05, atol=0.05
    )
    assert np.all(fast[:, :, ndisp:] > 0.5 * BIG_COST)


def test_cbca_rolling_tiny_width_falls_back_to_xla(rng):
    from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

    height, width, ndisp = 40, 30, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 4)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, 2, 4))
    ours = np.asarray(
        cbca_fused_rolling(jnp.asarray(volume), arms, 2, 4, interpret=True)
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)


def test_cbca_fused_tiny_shape_falls_back_to_xla(rng):
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    height, width, ndisp = 10, 12, 5
    d_pad = 8
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 4)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, 2, 4))
    ours = np.asarray(cbca_fused(jnp.asarray(volume), arms, 2, 4, interpret=True))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "iterations,dist,tile_h",
    [(2, 14, 64), (2, 14, 32), (4, 4, 64), (3, 14, 64)],
)
def test_cbca_fused_two_matches_xla(rng, iterations, dist, tile_h):
    """Two-round fused CBCA == exact stencil up to f32 accumulation order.

    Non-multiple-of-tile H/W exercise the clamped double-halo windows and
    the virtual intermediate rows/cols of the border tiles; odd iteration
    counts exercise the single-round remainder path. (Pad-lane BIG_COST
    fibers aggregate ~1e9-magnitude sums whose f32 ulp is ~128 — compare
    them relatively, not absolutely.)
    """
    from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

    height, width, ndisp = 100, 300, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, dist)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, iterations, dist))
    ours = np.asarray(
        cbca_fused_two(jnp.asarray(volume), arms, iterations, dist,
                       interpret=True, tile_h=tile_h)
    )
    assert ours.shape == volume.shape
    np.testing.assert_allclose(ours, expected, rtol=2e-5, atol=1e-4)


def test_cbca_fused_two_bf16_matches_f32_within_tolerance(rng):
    from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

    height, width, ndisp = 100, 300, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 14)

    exact = np.asarray(cbca(jnp.asarray(volume), arms, 2, 14))
    fast = np.asarray(
        cbca_fused_two(
            jnp.asarray(volume).astype(jnp.bfloat16), arms, 2, 14,
            interpret=True,
        )
    ).astype(np.float32)
    np.testing.assert_allclose(
        fast[:, :, :ndisp], exact[:, :, :ndisp], rtol=0.05, atol=0.05
    )
    assert np.all(fast[:, :, ndisp:] > 0.5 * BIG_COST)


def test_cbca_fused_two_narrow_width_falls_back(rng):
    from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

    height, width, ndisp = 40, 30, 5
    d_pad = 128
    image = rng.normal(size=(height, width)).astype(np.float32)
    volume = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    volume[:, :, :ndisp] = rng.normal(size=(height, width, ndisp))
    arms = compute_arms(jnp.asarray(image), 0.8, 4)

    expected = np.asarray(cbca(jnp.asarray(volume), arms, 2, 4))
    ours = np.asarray(
        cbca_fused_two(jnp.asarray(volume), arms, 2, 4, interpret=True)
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)
