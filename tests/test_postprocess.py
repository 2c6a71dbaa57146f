import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.ops.filters import bilateral_filter, median_filter
from mccnn_tpu.ops.lr_check import classify, lr_consistency_interpolate
from mccnn_tpu.ops.subpixel import subpixel_enhance
from mccnn_tpu.ops.wta import wta_disparity

from oracles import (
    bilateral_oracle,
    interpolation_oracle,
    median_oracle,
    subpixel_oracle,
    wta_oracle,
)


def _pad_volume(ref_volume, d_pad=16):
    ndisp, height, width = ref_volume.shape
    out = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    out[:, :, :ndisp] = np.moveaxis(ref_volume, 0, -1)
    return out


def test_wta_matches_oracle(rng):
    ref_volume = rng.normal(size=(6, 7, 9)).astype(np.float32)
    ours = wta_disparity(jnp.asarray(_pad_volume(ref_volume)))
    np.testing.assert_array_equal(np.asarray(ours), wta_oracle(ref_volume))


def test_wta_first_occurrence_ties():
    volume = np.zeros((3, 1, 2), dtype=np.float32)  # all costs equal
    ours = wta_disparity(jnp.asarray(_pad_volume(volume)))
    assert np.all(np.asarray(ours) == 0.0)


def _random_disparities(rng, height, width, ndisp):
    return rng.integers(0, ndisp, size=(height, width)).astype(np.float32)


def test_lr_interpolation_matches_oracle(rng):
    height, width, ndisp = 9, 13, 5
    disp_l = _random_disparities(rng, height, width, ndisp)
    disp_r = _random_disparities(rng, height, width, ndisp)
    expected_status, expected = interpolation_oracle(disp_l, disp_r, ndisp)

    status = np.asarray(classify(jnp.asarray(disp_l), jnp.asarray(disp_r), ndisp))
    np.testing.assert_array_equal(status, expected_status)

    ours = lr_consistency_interpolate(
        jnp.asarray(disp_l), jnp.asarray(disp_r), ndisp
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)


def test_lr_interpolation_all_match_is_identity(rng):
    height, width, ndisp = 5, 8, 4
    disp_l = _random_disparities(rng, height, width, ndisp)
    # dR(w - dL) == dL everywhere => all pixels match
    disp_r = np.zeros_like(disp_l)
    for h in range(height):
        for w in range(width):
            d = int(disp_l[h, w])
            if w - d >= 0:
                disp_r[h, w - d] = d
            else:
                disp_l[h, w] = 0.0
                disp_r[h, w] = 0.0
    expected_status, expected = interpolation_oracle(disp_l, disp_r, ndisp)
    ours = lr_consistency_interpolate(jnp.asarray(disp_l), jnp.asarray(disp_r), ndisp)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)


def test_subpixel_matches_oracle(rng):
    height, width, ndisp = 6, 8, 7
    ref_volume = rng.normal(size=(ndisp, height, width)).astype(np.float32)
    # fractional disparities, as after mismatch-fill medians
    disp = rng.integers(0, ndisp, size=(height, width)).astype(np.float32)
    disp += rng.choice([0.0, 0.5], size=disp.shape)
    disp = np.clip(disp, 0, ndisp - 1)

    expected = subpixel_oracle(disp, ref_volume)
    ours = subpixel_enhance(
        jnp.asarray(disp), jnp.asarray(_pad_volume(ref_volume)), ndisp
    )
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-4, atol=1e-5)


def test_median_filter_matches_oracle(rng):
    disp = rng.normal(size=(9, 12)).astype(np.float32)
    ours = median_filter(jnp.asarray(disp), 5, 5)
    np.testing.assert_allclose(np.asarray(ours), median_oracle(disp, 5, 5), atol=1e-6)


def test_median_filter_3x3(rng):
    disp = rng.normal(size=(6, 7)).astype(np.float32)
    ours = median_filter(jnp.asarray(disp), 3, 3)
    np.testing.assert_allclose(np.asarray(ours), median_oracle(disp, 3, 3), atol=1e-6)


def test_bilateral_filter_matches_oracle(rng):
    image = rng.normal(size=(8, 10)).astype(np.float32)
    disp = rng.normal(size=(8, 10)).astype(np.float32) * 3
    ours = bilateral_filter(
        jnp.asarray(image), jnp.asarray(disp), 5, 5, 0.0, 6.0, 2.0
    )
    expected = bilateral_oracle(image, disp, 5, 5, 0.0, 6.0, 2.0)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-4, atol=1e-5)


def test_bilateral_filter_tight_threshold(rng):
    """With a tight intensity threshold only the center survives."""
    image = (rng.normal(size=(6, 6)) * 100).astype(np.float32)
    disp = rng.normal(size=(6, 6)).astype(np.float32)
    ours = bilateral_filter(
        jnp.asarray(image), jnp.asarray(disp), 5, 5, 0.0, 6.0, 1e-6
    )
    np.testing.assert_allclose(np.asarray(ours), disp, rtol=1e-5)
