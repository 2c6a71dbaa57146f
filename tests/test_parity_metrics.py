"""Quantitative parity: bad-2.0 of our pipeline vs the oracle pipeline.

BASELINE.md's correctness north-star is bad-2.0 within 0.5 pt of the
reference pipeline; the oracle chain IS the reference's semantics, so we
measure both against the synthetic ground truth and against each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import extract_features, init_params
from mccnn_tpu.pipeline.match import match_pair
from mccnn_tpu.utils.config import MatchConfig
from mccnn_tpu.utils.evaluate import bad_n, evaluate_pair

from test_pipeline import CFG, _oracle_pipeline


def _textured_pair(rng, height=24, width=40, shift=3):
    """A translated textured pair with known constant disparity."""
    base = rng.normal(size=(height, width + shift)).astype(np.float32)
    kernel = np.ones(3) / 3.0
    base = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), 1, base
    )
    # left pixel (h, w) corresponds to right pixel (h, w - shift):
    # left[w] = base[w] = right[w - shift]
    left = base[:, :-shift] if shift else base
    right = base[:, shift:] if shift else base
    std = lambda x: ((x - x.mean()) / x.std()).astype(np.float32)  # noqa: E731
    gt = np.full((height, width), float(shift), dtype=np.float32)
    gt[:, :shift] = np.inf  # no correspondence at the left border
    return std(left), std(right), gt


def test_bad2_parity_with_oracle(rng):
    params = init_params(jax.random.key(3))
    left, right, gt = _textured_pair(rng)
    ndisp = 8

    ours = np.asarray(
        match_pair(params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG)
    )
    oracle = _oracle_pipeline(params, left, right, ndisp, CFG)

    ours_bad2 = bad_n(ours, gt, 2.0)
    oracle_bad2 = bad_n(oracle, gt, 2.0)
    assert abs(ours_bad2 - oracle_bad2) <= 0.005, (
        f"bad-2.0 ours={ours_bad2:.4f} oracle={oracle_bad2:.4f}"
    )
    # and both pipelines should actually solve this easy scene
    assert ours_bad2 < 0.25


def test_mxu_cbca_mode_parity(rng):
    """The fast (bf16 MXU) CBCA mode must stay within the parity budget."""
    params = init_params(jax.random.key(3))
    left, right, gt = _textured_pair(rng)
    ndisp = 8

    exact = np.asarray(
        match_pair(params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
                   cbca_impl="xla")
    )
    fast = np.asarray(
        match_pair(params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
                   cbca_impl="mxu")
    )
    assert abs(bad_n(fast, gt, 2.0) - bad_n(exact, gt, 2.0)) <= 0.005
    # pixelwise: nearly all disparities unchanged
    assert (np.abs(fast - exact) < 0.1).mean() > 0.97


def test_fullres_schedule_bad2_budget():
    """The full-res memory schedule (bf16 volumes + d-chunked fused CBCA +
    sequential pallas right-then-left build) gets the same bad-2.0 budget
    as the MXU mode (VERDICT r2 item 6): <=0.5 pt vs the exact-f32 pipeline
    on a structured >=128x192 scene at the paper's full hyperparameters
    (cbca_distance 14, iterations 2+16 — reference: src/match.py:33-35).

    The oracle-chain link for these semantics is pinned at smaller shapes
    (test_bad2_parity_with_oracle, test_reference_chain) — the oracle's
    per-pixel Python CBCA is intractable at this size.
    """
    from mccnn_tpu.utils.scenes import scene_pair

    params = init_params(jax.random.key(3))
    left, right, gt, occluded, ndisp = scene_pair(
        "occlusion", np.random.default_rng(7), height=128, width=192,
        max_disparity=12,
    )
    config = MatchConfig()  # paper defaults
    gt = gt.copy()
    gt[occluded] = np.inf  # score only pixels with a visible correspondence

    exact = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, config,
        cost_volume_method="pallas", cbca_impl="xla",
    ))
    fast = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, config,
        cost_volume_method="pallas", cbca_impl="fused",
        volume_dtype="bfloat16", cbca_chunk_d=64,
    ))

    assert abs(bad_n(fast, gt, 2.0) - bad_n(exact, gt, 2.0)) <= 0.005
    assert (np.abs(fast - exact) <= 1.0).mean() > 0.99


def test_evaluate_pair_metrics():
    gt = np.array([[1.0, np.inf], [3.0, 5.0]], dtype=np.float32)
    disp = np.array([[1.2, 9.0], [3.0, 0.0]], dtype=np.float32)
    metrics = evaluate_pair(disp, gt)
    assert metrics["coverage"] == 0.75
    np.testing.assert_allclose(metrics["bad_2.0"], 1.0 / 3.0)
    np.testing.assert_allclose(metrics["avg_err"], (0.2 + 0.0 + 5.0) / 3.0)


def test_photo_scene_family():
    """The ``photo`` family (round-5): REAL photographic texture from
    package-bundled photographs, slanted plane + occluding boxes.

    All other quality evidence uses band-limited synthetic noise; this is
    the closest this data-free environment gets to the reference's
    Middlebury validation (real camera-image gradient statistics driving
    the CBCA intensity test and SGM's D1/D2 penalties, reference:
    src/process_functional.py:503-541,571-657).
    """
    from mccnn_tpu.utils.scenes import _photo_paths, make_scene, scene_pair

    # this environment bundles real photos (sklearn/matplotlib data files)
    assert _photo_paths(), "no bundled photographs found"

    scene = make_scene("photo", np.random.default_rng(0), 64, 96,
                       max_disparity=10)
    again = make_scene("photo", np.random.default_rng(0), 64, 96,
                       max_disparity=10)
    np.testing.assert_array_equal(scene["left"], again["left"])  # determinism
    assert scene["ndisp"] > scene["gt"].max()
    # left border (x < d) is always occluded; interior occlusion from boxes
    assert scene["occluded"][:, :2].all()
    assert 0.0 < scene["occluded"].mean() < 0.3
    # photographic texture, not the synthetic octaves: real photos quantize
    # to uint8 steps of 1/255 before grayscale conversion
    vals = np.unique(np.round(scene["right"] * 255.0, 3))
    assert np.allclose(vals, np.round(vals))

    # the full pipeline solves photo scenes even with random-init features
    # (measured seeds 0/2: bad-4.0 0.000/0.001, avg_err 0.33/0.46)
    params = init_params(jax.random.key(0))
    for seed, family_bound in ((0, 0.6), (2, 0.7)):
        left, right, gt, occluded, ndisp = scene_pair(
            "photo", np.random.default_rng(seed), 48, 64, max_disparity=6
        )
        gt_eval = np.where(occluded, np.nan, gt)
        disp = np.asarray(match_pair(
            params, jnp.asarray(left), jnp.asarray(right), ndisp,
            MatchConfig(), cost_volume_method="matmul", cbca_impl="xla",
        ))
        metrics = evaluate_pair(disp, gt_eval)
        assert metrics["bad_4.0"] <= 0.02, metrics
        assert metrics["avg_err"] <= family_bound, metrics
        assert metrics["coverage"] > 0.9, metrics
