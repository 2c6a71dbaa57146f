import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.ops.cbca import cbca, compute_arms
from mccnn_tpu.ops.common import BIG_COST

from oracles import cbca_oracle, cross_regions_oracle


def _pad_volume(ref_volume, d_pad=16):
    """(ndisp, H, W) reference layout -> (H, W, d_pad) with BIG_COST pad."""
    ndisp, height, width = ref_volume.shape
    out = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    out[:, :, :ndisp] = np.moveaxis(ref_volume, 0, -1)
    return out


def _arm_length(center, line, pos, step, max_offsets, tau):
    """Offsets (excluding self) the arm extends in one direction."""
    length = 0
    for off in range(1, max_offsets):
        probe = pos + step * off
        if abs(center - line[probe]) >= tau:
            break
        length += 1
    return length


def test_arms_match_loop_semantics(rng):
    image = rng.normal(size=(9, 11)).astype(np.float32)
    tau, dist = 0.8, 4
    arms = compute_arms(jnp.asarray(image), tau, dist)
    height, width = image.shape
    for h in range(height):
        for w in range(width):
            center = image[h, w]
            assert arms.up[h, w] == _arm_length(
                center, image[:, w], h, -1, min(dist, h + 1), tau
            )
            assert arms.down[h, w] == _arm_length(
                center, image[:, w], h, +1, min(dist, height - h), tau
            )
            assert arms.left[h, w] == _arm_length(
                center, image[h, :], w, -1, min(dist, w + 1), tau
            )
            assert arms.right[h, w] == _arm_length(
                center, image[h, :], w, +1, min(dist, width - w), tau
            )


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_cbca_matches_oracle(rng, iterations):
    height, width, ndisp = 7, 10, 5
    image = rng.normal(size=(height, width)).astype(np.float32)
    ref_volume = rng.normal(size=(ndisp, height, width)).astype(np.float32)
    tau, dist = 0.8, 4

    arms = compute_arms(jnp.asarray(image), tau, dist)
    ours = cbca(jnp.asarray(_pad_volume(ref_volume)), arms, iterations)
    ours_ref_layout = np.moveaxis(np.asarray(ours)[:, :, :ndisp], -1, 0)

    regions = cross_regions_oracle(image, tau, dist)
    expected = cbca_oracle(ref_volume, regions, iterations)
    np.testing.assert_allclose(ours_ref_layout, expected, rtol=1e-4, atol=1e-4)


def test_cbca_pad_lanes_stay_big(rng):
    image = rng.normal(size=(6, 8)).astype(np.float32)
    volume = _pad_volume(rng.normal(size=(4, 6, 8)).astype(np.float32))
    arms = compute_arms(jnp.asarray(image), 0.8, 3)
    out = np.asarray(cbca(jnp.asarray(volume), arms, 2))
    assert np.all(np.isfinite(out))
    assert np.all(out[:, :, 4:] > 0.5 * BIG_COST)


def test_cbca_zero_iterations_is_identity(rng):
    image = rng.normal(size=(5, 6)).astype(np.float32)
    volume = _pad_volume(rng.normal(size=(3, 5, 6)).astype(np.float32))
    arms = compute_arms(jnp.asarray(image), 0.5, 3)
    np.testing.assert_array_equal(np.asarray(cbca(jnp.asarray(volume), arms, 0)), volume)


@pytest.mark.parametrize("choice", ["L", "R"])
@pytest.mark.parametrize("iterations", [1, 2])
def test_cbca_joint_regions_matches_oracle(rng, choice, iterations):
    from mccnn_tpu.ops.cbca_joint import cbca_joint

    from oracles import joint_cbca_oracle

    height, width, ndisp = 10, 14, 4
    tau, dist = 0.8, 3
    left = rng.normal(size=(height, width)).astype(np.float32)
    right = rng.normal(size=(height, width)).astype(np.float32)
    ref_volume = rng.normal(size=(ndisp, height, width)).astype(np.float32)

    self_img, other_img = (left, right) if choice == "L" else (right, left)
    arms_self = compute_arms(jnp.asarray(self_img), tau, dist)
    arms_other = compute_arms(jnp.asarray(other_img), tau, dist)
    ours = cbca_joint(
        jnp.asarray(_pad_volume(ref_volume)), arms_self, arms_other,
        iterations, dist, ndisp, choice,
    )
    ours_ref_layout = np.moveaxis(np.asarray(ours)[:, :, :ndisp], -1, 0)

    regions_self = cross_regions_oracle(self_img, tau, dist)
    regions_other = cross_regions_oracle(other_img, tau, dist)
    expected = joint_cbca_oracle(
        ref_volume, regions_self, regions_other, iterations, choice
    )
    np.testing.assert_allclose(ours_ref_layout, expected, rtol=1e-4, atol=1e-4)
