import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.ops.cost_volume import cost_volume_pair

from oracles import cost_volume_oracle


def _unit_features(rng, height, width, channels=8):
    f = rng.normal(size=(height, width, channels)).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


def _to_reference_layout(volume, ndisp):
    return np.moveaxis(np.asarray(volume)[:, :, :ndisp], -1, 0)


@pytest.mark.parametrize("method", ["matmul", "rolldot"])
def test_cost_volume_matches_oracle(rng, method):
    height, width, ndisp = 6, 23, 9
    fl = _unit_features(rng, height, width)
    fr = _unit_features(rng, height, width)
    left, right = cost_volume_pair(
        jnp.asarray(fl), jnp.asarray(fr), ndisp, method=method
    )
    oracle_l, oracle_r = cost_volume_oracle(fl, fr, ndisp)
    np.testing.assert_allclose(
        _to_reference_layout(left, ndisp), oracle_l, atol=1e-5
    )
    np.testing.assert_allclose(
        _to_reference_layout(right, ndisp), oracle_r, atol=1e-5
    )


def test_cost_volume_padding_is_big(rng):
    fl = _unit_features(rng, 4, 16)
    fr = _unit_features(rng, 4, 16)
    left, right = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 5)
    assert left.shape == (4, 16, 128)
    assert np.all(np.asarray(left)[:, :, 5:] == BIG_COST)
    assert np.all(np.asarray(right)[:, :, 5:] == BIG_COST)


def test_methods_agree(rng):
    fl = _unit_features(rng, 5, 40, channels=16)
    fr = _unit_features(rng, 5, 40, channels=16)
    left_a, right_a = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                                       method="matmul")
    left_b, right_b = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                                       method="rolldot")
    np.testing.assert_allclose(np.asarray(left_a), np.asarray(left_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(right_a), np.asarray(right_b), atol=1e-5)


def test_minimal_width_regime(rng):
    """W = ndisp + 2 is the narrowest width where the reference's border
    fills stay well-defined (narrower widths make its right-volume fill
    average over an empty slice); pin parity at the boundary."""
    height, width, ndisp = 4, 8, 6
    fl = _unit_features(rng, height, width)
    fr = _unit_features(rng, height, width)
    left, right = cost_volume_pair(
        jnp.asarray(fl), jnp.asarray(fr), ndisp, d_pad=8, method="rolldot"
    )
    oracle_l, oracle_r = cost_volume_oracle(fl, fr, ndisp)
    np.testing.assert_allclose(
        _to_reference_layout(left, ndisp), oracle_l, atol=1e-5
    )
    np.testing.assert_allclose(
        _to_reference_layout(right, ndisp), oracle_r, atol=1e-5
    )


@pytest.mark.parametrize("side", ["left", "right"])
def test_single_side_matches_pair(rng, side):
    fl = _unit_features(rng, 5, 40, channels=16)
    fr = _unit_features(rng, 5, 40, channels=16)
    pair = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                            method="pallas")
    single = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                              method="pallas", sides=side)
    expected = pair[0] if side == "left" else pair[1]
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(expected), atol=1e-6
    )


def test_bf16_volume_dtype_and_values(rng):
    fl = _unit_features(rng, 5, 40, channels=16)
    fr = _unit_features(rng, 5, 40, channels=16)
    left32, right32 = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                                       method="pallas")
    left16, right16 = cost_volume_pair(jnp.asarray(fl), jnp.asarray(fr), 12,
                                       method="pallas", dtype=jnp.bfloat16)
    assert left16.dtype == jnp.bfloat16 and right16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(left16[:, :, :12]).astype(np.float32),
        np.asarray(left32[:, :, :12]), rtol=0.02, atol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(right16[:, :, :12]).astype(np.float32),
        np.asarray(right32[:, :, :12]), rtol=0.02, atol=0.02,
    )
    assert np.all(np.asarray(left16[:, :, 12:]).astype(np.float32)
                  > 0.5 * BIG_COST)
