import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import extract_features, init_params
from mccnn_tpu.pipeline.match import MatchPipeline, match_pair, standardize_image
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

CFG = MatchConfig(
    cbca_intensity=0.4,
    cbca_distance=3,
    cbca_num_iterations_1=1,
    cbca_num_iterations_2=2,
    sgm_d=0.4,
)


def _oracle_pipeline(params, left, right, ndisp, cfg):
    feat_l = np.asarray(extract_features(params, jnp.asarray(left)))
    feat_r = np.asarray(extract_features(params, jnp.asarray(right)))
    lcv, rcv = cost_volume_oracle(feat_l, feat_r, ndisp)

    regions_l = cross_regions_oracle(left, cfg.cbca_intensity, int(cfg.cbca_distance))
    regions_r = cross_regions_oracle(right, cfg.cbca_intensity, int(cfg.cbca_distance))
    lcv = cbca_oracle(lcv, regions_l, cfg.cbca_num_iterations_1)
    rcv = cbca_oracle(rcv, regions_r, cfg.cbca_num_iterations_1)

    lcv, rcv = sgm_average_oracle(
        lcv, rcv, left, right, cfg.sgm_p1, cfg.sgm_p2, cfg.sgm_q1, cfg.sgm_q2,
        cfg.sgm_d, cfg.sgm_v,
    )
    lcv = cbca_oracle(lcv, regions_l, cfg.cbca_num_iterations_2)
    rcv = cbca_oracle(rcv, regions_r, cfg.cbca_num_iterations_2)

    disp_l = wta_oracle(lcv)
    disp_r = wta_oracle(rcv)
    _, disp = interpolation_oracle(disp_l, disp_r, ndisp)
    disp = subpixel_oracle(disp, lcv)
    disp = median_oracle(disp, cfg.median_filter_size, cfg.median_filter_size)
    disp = bilateral_oracle(
        left, disp, cfg.bilateral_filter_size, cfg.bilateral_filter_size,
        0.0, cfg.blur_sigma, cfg.blur_threshold,
    )
    return disp


def _stereo_pair(rng, height=10, width=16):
    """A synthetic pair with actual horizontal structure."""
    left = rng.normal(size=(height, width)).astype(np.float32)
    right = np.roll(left, -2, axis=1) + 0.05 * rng.normal(
        size=(height, width)
    ).astype(np.float32)
    return standardize_image(left), standardize_image(right)


def test_end_to_end_matches_oracle_chain(rng):
    params = init_params(jax.random.key(1))
    left, right = _stereo_pair(rng)
    ndisp = 5

    ours = np.asarray(match_pair(params, jnp.asarray(left), jnp.asarray(right),
                                 ndisp, CFG))
    expected = _oracle_pipeline(params, left, right, ndisp, CFG)

    # argmin ties under fp reassociation may flip isolated pixels; demand
    # near-total agreement and tight numeric match elsewhere
    close = np.isclose(ours, expected, atol=1e-2)
    assert close.mean() > 0.98, f"only {close.mean():.2%} pixels agree"


def test_match_pipeline_buckets_and_crops(rng):
    params = init_params(jax.random.key(1))
    left, right = _stereo_pair(rng, height=11, width=19)
    pipeline = MatchPipeline(params, CFG, bucket=8)
    out = pipeline(left, right, ndisp=4)
    assert out.shape == (11, 19)
    assert np.isfinite(out).all()
    # cache: second call with same shape must reuse the compiled program
    assert len(pipeline._compiled) == 1
    pipeline(left, right, ndisp=4)
    assert len(pipeline._compiled) == 1


def test_match_pair_is_jittable(rng):
    params = init_params(jax.random.key(1))
    left, right = _stereo_pair(rng, height=8, width=12)
    fn = jax.jit(lambda p, l, r: match_pair(p, l, r, 4, CFG))
    out = fn(params, jnp.asarray(left), jnp.asarray(right))
    assert out.shape == (8, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_paper_mode_pipeline_differs_from_chained(rng):
    """sgm_paper_mode switches the SGM semantics end-to-end."""
    params = init_params(jax.random.key(1))
    left, right = _stereo_pair(rng, height=10, width=16)
    chained = np.asarray(match_pair(params, jnp.asarray(left),
                                    jnp.asarray(right), 5, CFG))
    paper = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), 5,
        CFG.replace(sgm_paper_mode=True),
    ))
    assert chained.shape == paper.shape
    assert not np.allclose(chained, paper)


def test_bf16_chunked_pipeline_close_to_f32(rng):
    """The full-resolution memory mode (bf16 volumes, d-chunked fused CBCA,
    sequential right-then-left schedule) must track the exact pipeline."""
    height, width, ndisp = 48, 164, 6
    params = init_params(jax.random.key(3))
    left = standardize_image(rng.normal(size=(height, width)).astype(np.float32))
    right = standardize_image(np.roll(left, -2, axis=1))

    exact = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
        cost_volume_method="pallas", cbca_impl="fused",
    ))
    fast = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
        cost_volume_method="pallas", cbca_impl="fused",
        volume_dtype="bfloat16", cbca_chunk_d=128,
    ))
    assert fast.shape == exact.shape
    assert np.isfinite(fast).all()
    # bf16 volume quantization: disparities may differ at ambiguous pixels;
    # require agreement within 1 disparity for the vast majority
    agree = np.abs(fast - exact) <= 1.0
    assert agree.mean() > 0.97


def test_sequential_pallas_schedule_matches_pair_build(rng):
    """The right-then-left single-side schedule (pallas path) must be
    numerically identical to the pair-build path at f32."""
    height, width, ndisp = 48, 164, 6
    params = init_params(jax.random.key(4))
    left = standardize_image(rng.normal(size=(height, width)).astype(np.float32))
    right = standardize_image(np.roll(left, -2, axis=1))

    seq = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
        cost_volume_method="pallas", cbca_impl="xla",
    ))
    pair = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
        cost_volume_method="matmul", cbca_impl="xla",
    ))
    np.testing.assert_allclose(seq, pair, atol=2e-3)


def test_joint_region_pipeline_runs_and_differs(rng):
    """cbca_joint_regions=True must run end-to-end and change the result
    (the d-conditioned regions shrink supports at disparity edges)."""
    params = init_params(jax.random.key(5))
    left, right = _stereo_pair(rng, height=12, width=18)
    plain = np.asarray(match_pair(params, jnp.asarray(left),
                                  jnp.asarray(right), 5, CFG))
    joint = np.asarray(match_pair(
        params, jnp.asarray(left), jnp.asarray(right), 5,
        CFG.replace(cbca_joint_regions=True),
    ))
    assert joint.shape == plain.shape
    assert np.isfinite(joint).all()
    assert not np.allclose(joint, plain)
