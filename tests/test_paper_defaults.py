"""Oracle parity at the PAPER-DEFAULT hyperparameters.

The other pipeline tests shrink the hyperparameters (cbca_distance=3,
1-2 iterations, sgm_d=0.4) to keep the loop oracles fast; an off-by-one at
the real radius-13 arm growth or drift over the real 2+16 aggregation
rounds would pass them. These tests pin the defaults
(reference: src/match.py:31-43 — cbca 0.02/14, iterations 2+16,
SGM 2.3/55.9/4/8/0.08/1.5, blur 6/2) on a crop small enough for the
transliterated reference loops.

The synthetic image is smooth (slow sinusoids + step edges + weak noise)
so that arms actually grow: with pure noise every |dI| exceeds tau=0.02
and the radius cap is never exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import extract_features, init_params
from mccnn_tpu.ops.cbca import compute_arms
from mccnn_tpu.pipeline.match import match_pair
from mccnn_tpu.utils.config import MatchConfig

from oracles import (
    bilateral_oracle,
    cbca_oracle,
    cost_volume_oracle,
    cross_regions_oracle,
    interpolation_oracle,
    median_oracle,
    sgm_average_oracle,
    subpixel_oracle,
    wta_oracle,
)

PAPER = MatchConfig()  # the defaults ARE the paper values


def _smooth_scene(rng, height=48, width=64, shift=3):
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    left = (
        0.12 * np.sin(xx / 15.0)
        + 0.1 * np.cos(yy / 13.0)
        + 0.8 * (xx > 40)
        + 0.5 * (yy > 30)
        + 0.003 * rng.normal(size=(height, width))
    ).astype(np.float32)
    right = np.roll(left, -shift, axis=1).astype(np.float32)
    return left, right


def test_arms_match_regions_oracle_at_paper_distance(rng):
    """compute_arms vs the reference's region growth at distance 14,
    including pixels that hit the radius-13 cap."""
    left, _ = _smooth_scene(rng)
    tau, dist = PAPER.cbca_intensity, int(PAPER.cbca_distance)
    arms = compute_arms(jnp.asarray(left), tau, dist)
    up = np.asarray(arms.up)
    down = np.asarray(arms.down)
    h_count = np.asarray(arms.left) + np.asarray(arms.right) + 1

    regions = cross_regions_oracle(left, tau, dist)
    height, width = left.shape
    capped = 0
    for h in range(height):
        for w in range(width):
            ours = int(
                h_count[h - up[h, w]: h + down[h, w] + 1, w].sum()
            )
            assert ours == len(regions[h, w]), (h, w)
            # spot-check full membership on a subgrid (sets, not just sizes)
            if h % 7 == 0 and w % 11 == 0:
                mine = {
                    (hh, ww)
                    for hh in range(h - up[h, w], h + down[h, w] + 1)
                    for ww in range(
                        w - int(np.asarray(arms.left)[hh, w]),
                        w + int(np.asarray(arms.right)[hh, w]) + 1,
                    )
                }
                assert mine == set(regions[h, w]), (h, w)
    capped = int((np.asarray(arms.left) == dist - 1).sum())
    assert capped > 0, "test image never exercises the radius cap"


def test_pipeline_paper_defaults_matches_oracle_chain(rng):
    """Full 10-stage pipeline vs the oracle chain at the PAPER defaults
    (2+16 CBCA rounds at radius 13, sgm_d=0.08) on a 48x64/ndisp-16 crop."""
    params = init_params(jax.random.key(2))
    left, right = _smooth_scene(rng)
    ndisp = 16

    ours = np.asarray(
        match_pair(params, jnp.asarray(left), jnp.asarray(right), ndisp, PAPER)
    )

    feat_l = np.asarray(extract_features(params, jnp.asarray(left)))
    feat_r = np.asarray(extract_features(params, jnp.asarray(right)))
    lcv, rcv = cost_volume_oracle(feat_l, feat_r, ndisp)
    regions_l = cross_regions_oracle(
        left, PAPER.cbca_intensity, int(PAPER.cbca_distance)
    )
    regions_r = cross_regions_oracle(
        right, PAPER.cbca_intensity, int(PAPER.cbca_distance)
    )
    lcv = cbca_oracle(lcv, regions_l, PAPER.cbca_num_iterations_1)
    rcv = cbca_oracle(rcv, regions_r, PAPER.cbca_num_iterations_1)
    lcv, rcv = sgm_average_oracle(
        lcv, rcv, left, right, PAPER.sgm_p1, PAPER.sgm_p2, PAPER.sgm_q1,
        PAPER.sgm_q2, PAPER.sgm_d, PAPER.sgm_v,
    )
    lcv = cbca_oracle(lcv, regions_l, PAPER.cbca_num_iterations_2)
    rcv = cbca_oracle(rcv, regions_r, PAPER.cbca_num_iterations_2)
    disp_l = wta_oracle(lcv)
    disp_r = wta_oracle(rcv)
    _, expected = interpolation_oracle(disp_l, disp_r, ndisp)
    expected = subpixel_oracle(expected, lcv)
    expected = median_oracle(
        expected, PAPER.median_filter_size, PAPER.median_filter_size
    )
    expected = bilateral_oracle(
        left, expected, PAPER.bilateral_filter_size,
        PAPER.bilateral_filter_size, 0.0, PAPER.blur_sigma,
        PAPER.blur_threshold,
    )

    close = np.isclose(ours, expected, atol=1e-2)
    assert close.mean() > 0.97, f"only {close.mean():.2%} pixels agree"
