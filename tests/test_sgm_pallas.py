"""The Pallas DP sweep kernel against the XLA scan sweep (the oracle-pinned
reference implementation — test_sgm.py pins that one to the loop oracle).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.ops.sgm import _sgm_one_volume
from mccnn_tpu.ops.sgm_pallas import sgm_pallas_one_volume
from mccnn_tpu.utils.config import MatchConfig


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _case(rng, height=24, width=40, ndisp=5, d_pad=128):
    left = rng.normal(size=(height, width)).astype(np.float32)
    right = rng.normal(size=(height, width)).astype(np.float32)
    volume = rng.normal(size=(height, width, d_pad)).astype(np.float32)
    volume[:, :, ndisp:] = BIG_COST
    return left, right, volume, ndisp


@pytest.mark.parametrize("choice", ["L", "R"])
@pytest.mark.parametrize("paper_mode", [False, True])
def test_sgm_pallas_matches_xla(rng, choice, paper_mode):
    left, right, volume, ndisp = _case(rng)
    config = MatchConfig(sgm_paper_mode=paper_mode)
    expected = np.asarray(
        _sgm_one_volume(
            jnp.asarray(volume), jnp.asarray(left), jnp.asarray(right),
            choice, ndisp, config,
        )
    )
    ours = np.asarray(
        sgm_pallas_one_volume(
            jnp.asarray(volume), jnp.asarray(left), jnp.asarray(right),
            choice, ndisp, config,
        )
    )
    np.testing.assert_allclose(
        ours[:, :, :ndisp], expected[:, :, :ndisp], rtol=1e-5, atol=1e-4
    )
    # disparity-pad lanes stay huge (argmin can never pick them)
    assert np.all(ours[:, :, ndisp:] > 0.5 * BIG_COST)


def test_sgm_pallas_bf16_storage(rng):
    """bf16 volumes: DP math in f32, storage quantized per line — compare
    against the XLA sweep on the same bf16 volume (identical convention)."""
    left, right, volume, ndisp = _case(rng)
    config = MatchConfig()
    vol16 = jnp.asarray(volume).astype(jnp.bfloat16)
    expected = np.asarray(
        _sgm_one_volume(
            vol16, jnp.asarray(left), jnp.asarray(right), "L", ndisp, config
        ).astype(jnp.float32)
    )
    ours = np.asarray(
        sgm_pallas_one_volume(
            vol16, jnp.asarray(left), jnp.asarray(right), "L", ndisp, config
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(
        ours[:, :, :ndisp], expected[:, :, :ndisp], rtol=2e-2, atol=0.5
    )


def test_sgm_pallas_unaligned_shapes(rng):
    """S not a chunk multiple and P above one tile exercise the BIG-pad
    pass-through and the multi-tile grid."""
    left, right, volume, ndisp = _case(rng, height=21, width=37)
    config = MatchConfig()
    expected = np.asarray(
        _sgm_one_volume(
            jnp.asarray(volume), jnp.asarray(left), jnp.asarray(right),
            "L", ndisp, config,
        )
    )
    ours = np.asarray(
        sgm_pallas_one_volume(
            jnp.asarray(volume), jnp.asarray(left), jnp.asarray(right),
            "L", ndisp, config,
        )
    )
    np.testing.assert_allclose(
        ours[:, :, :ndisp], expected[:, :, :ndisp], rtol=1e-5, atol=1e-4
    )
