import jax.numpy as jnp
import numpy as np
import pytest

from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.ops.sgm import _directional_sweep, sgm
from mccnn_tpu.utils.config import MatchConfig

from oracles import sgm_average_oracle, sgm_sweep_oracle

CFG = MatchConfig(sgm_p1=2.3, sgm_p2=55.9, sgm_q1=4.0, sgm_q2=8.0,
                  sgm_d=0.5, sgm_v=1.5)


def _pad_volume(ref_volume, d_pad=16):
    ndisp, height, width = ref_volume.shape
    out = np.full((height, width, d_pad), BIG_COST, dtype=np.float32)
    out[:, :, :ndisp] = np.moveaxis(ref_volume, 0, -1)
    return out


def _unpad(volume, ndisp):
    return np.moveaxis(np.asarray(volume)[:, :, :ndisp], -1, 0)


def _problem(rng, height=6, width=9, ndisp=4):
    img_l = rng.normal(size=(height, width)).astype(np.float32)
    img_r = rng.normal(size=(height, width)).astype(np.float32)
    volume = rng.normal(size=(ndisp, height, width)).astype(np.float32)
    return img_l, img_r, volume


@pytest.mark.parametrize("direction", [(0, 1), (0, -1), (-1, 0), (1, 0)])
@pytest.mark.parametrize("choice", ["L", "R"])
def test_single_sweep_matches_oracle(rng, direction, choice):
    img_l, img_r, ref_volume = _problem(rng)
    ndisp = ref_volume.shape[0]
    rh, _ = direction
    p1_eff = CFG.sgm_p1 / CFG.sgm_v if rh != 0 else CFG.sgm_p1

    ours = _directional_sweep(
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(img_l),
        jnp.asarray(img_r),
        choice,
        direction,
        ndisp,
        CFG,
    )
    expected = sgm_sweep_oracle(
        img_l, img_r, ref_volume.copy(), direction,
        p1_eff, CFG.sgm_p2, CFG.sgm_q1, CFG.sgm_q2, CFG.sgm_d, choice,
    )
    np.testing.assert_allclose(_unpad(ours, ndisp), expected, rtol=1e-5, atol=1e-5)


def test_chained_sweeps_match_reference_quirk(rng):
    """Default mode reproduces the reference's in-place sequential sweeps
    (the aliasing at reference: src/process_functional.py:544,210)."""
    img_l, img_r, ref_l = _problem(rng)
    ref_r = rng.normal(size=ref_l.shape).astype(np.float32)
    ndisp = ref_l.shape[0]

    ours_l, ours_r = sgm(
        jnp.asarray(_pad_volume(ref_l)),
        jnp.asarray(_pad_volume(ref_r)),
        jnp.asarray(img_l),
        jnp.asarray(img_r),
        ndisp,
        CFG,
    )
    exp_l, exp_r = sgm_average_oracle(
        ref_l, ref_r, img_l, img_r,
        CFG.sgm_p1, CFG.sgm_p2, CFG.sgm_q1, CFG.sgm_q2, CFG.sgm_d, CFG.sgm_v,
    )
    np.testing.assert_allclose(_unpad(ours_l, ndisp), exp_l, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_unpad(ours_r, ndisp), exp_r, rtol=1e-4, atol=1e-4)


def test_paper_mode_averages_independent_sweeps(rng):
    img_l, img_r, ref_volume = _problem(rng, height=5, width=7, ndisp=3)
    ndisp = ref_volume.shape[0]
    cfg = CFG.replace(sgm_paper_mode=True)

    ours_l, _ = sgm(
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(img_l),
        jnp.asarray(img_r),
        ndisp,
        cfg,
    )
    sweeps = []
    for direction, p1_eff in (
        ((0, 1), CFG.sgm_p1),
        ((0, -1), CFG.sgm_p1),
        ((-1, 0), CFG.sgm_p1 / CFG.sgm_v),
        ((1, 0), CFG.sgm_p1 / CFG.sgm_v),
    ):
        sweeps.append(
            sgm_sweep_oracle(
                img_l, img_r, ref_volume.copy(), direction,
                p1_eff, CFG.sgm_p2, CFG.sgm_q1, CFG.sgm_q2, CFG.sgm_d, "L",
            )
        )
    expected = sum(sweeps) / 4.0
    np.testing.assert_allclose(_unpad(ours_l, ndisp), expected, rtol=1e-4, atol=1e-4)


def test_first_line_kept(rng):
    """The first row/column in sweep order is never updated."""
    img_l, img_r, ref_volume = _problem(rng)
    ndisp = ref_volume.shape[0]
    padded = _pad_volume(ref_volume)
    out = _directional_sweep(
        jnp.asarray(padded), jnp.asarray(img_l), jnp.asarray(img_r),
        "L", (0, 1), ndisp, CFG,
    )
    np.testing.assert_array_equal(np.asarray(out)[:, 0, :], padded[:, 0, :])


def test_pad_lanes_stay_big(rng):
    img_l, img_r, ref_volume = _problem(rng)
    ndisp = ref_volume.shape[0]
    out_l, out_r = sgm(
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(img_l), jnp.asarray(img_r), ndisp, CFG,
    )
    assert np.all(np.asarray(out_l)[:, :, ndisp:] > 0.5 * BIG_COST)
    assert np.all(np.asarray(out_r)[:, :, ndisp:] > 0.5 * BIG_COST)


@pytest.mark.parametrize("direction", [(-1, 0), (1, 0)])
@pytest.mark.parametrize("choice", ["L", "R"])
def test_vertical_sweep_chunked_b2_matches_oracle(rng, direction, choice,
                                                  monkeypatch):
    """The full-res D2 path (conv-patches per scan chunk, taken when the
    bool probe volume exceeds _B2_MATERIALIZE_LIMIT) is oracle-exact."""
    import sys

    # `mccnn_tpu.ops` re-exports the `sgm` FUNCTION, which shadows the
    # submodule on attribute-style import — go through sys.modules
    sgm_mod = sys.modules["mccnn_tpu.ops.sgm"]
    monkeypatch.setattr(sgm_mod, "_B2_MATERIALIZE_LIMIT", 0)
    img_l, img_r, ref_volume = _problem(rng, height=10, width=17, ndisp=5)
    ndisp = ref_volume.shape[0]
    p1_eff = CFG.sgm_p1 / CFG.sgm_v

    ours = _directional_sweep(
        jnp.asarray(_pad_volume(ref_volume)),
        jnp.asarray(img_l), jnp.asarray(img_r),
        choice, direction, ndisp, CFG,
    )
    expected = sgm_sweep_oracle(
        img_l, img_r, ref_volume.copy(), direction,
        p1_eff, CFG.sgm_p2, CFG.sgm_q1, CFG.sgm_q2, CFG.sgm_d, choice,
    )
    np.testing.assert_allclose(_unpad(ours, ndisp), expected,
                               rtol=1e-5, atol=1e-5)
