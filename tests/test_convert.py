"""Converter tests against the reference's shipped trained checkpoint."""

import os

import numpy as np
import pytest

REFERENCE_CKPT = "/root/reference/data/tensorboard_log/model_epoch2000.ckpt"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CKPT + ".index"),
    reason="reference checkpoint not mounted",
)
def test_convert_shipped_tf_checkpoint(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841 — reader only

    from mccnn_tpu.models.params import load_tf_checkpoint

    params = load_tf_checkpoint(REFERENCE_CKPT)
    assert sorted(params) == [f"conv{i}" for i in range(1, 6)]
    assert params["conv1"]["w"].shape == (3, 3, 1, 64)
    for i in range(2, 6):
        assert params[f"conv{i}"]["w"].shape == (3, 3, 64, 64)
        assert params[f"conv{i}"]["b"].shape == (64,)
    # trained weights, not init noise
    assert float(np.abs(params["conv1"]["w"]).max()) > 0.01


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CKPT + ".index"),
    reason="reference checkpoint not mounted",
)
def test_convert_cli_tf_to_npz_and_npy(tmp_path):
    pytest.importorskip("tensorflow")

    from mccnn_tpu.cli.convert import main
    from mccnn_tpu.models.params import load_any

    npz_path = str(tmp_path / "weights.npz")
    main([REFERENCE_CKPT, npz_path])
    params = load_any(npz_path)
    assert params["conv5"]["w"].shape == (3, 3, 64, 64)

    npy_path = str(tmp_path / "pretrain.npy")
    main([npz_path, npy_path])
    round_tripped = load_any(npy_path)
    np.testing.assert_array_equal(
        round_tripped["conv3"]["w"], params["conv3"]["w"]
    )


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CKPT + ".index"),
    reason="reference checkpoint not mounted",
)
def test_trained_weights_produce_discriminative_descriptors(rng):
    """With the shipped trained weights, matching patches must score higher
    than clearly-off patches (sanity that conversion preserved semantics)."""
    pytest.importorskip("tensorflow")

    import jax.numpy as jnp

    from mccnn_tpu.models.net import patch_descriptors
    from mccnn_tpu.models.params import load_tf_checkpoint

    params = load_tf_checkpoint(REFERENCE_CKPT)
    base = rng.normal(size=(30, 60)).astype(np.float32)
    base = (base - base.mean()) / base.std()
    # smooth it a bit so shifted patches are genuinely similar
    kernel = np.ones(5) / 5
    base = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), 1, base
    ).astype(np.float32)

    anchor = base[10:21, 20:31][None, :, :, None]
    same = base[10:21, 20:31][None, :, :, None]
    other = base[15:26, 40:51][None, :, :, None]

    d_anchor = patch_descriptors(params, jnp.asarray(anchor))
    d_same = patch_descriptors(params, jnp.asarray(same))
    d_other = patch_descriptors(params, jnp.asarray(other))
    s_same = float(jnp.sum(d_anchor * d_same))
    s_other = float(jnp.sum(d_anchor * d_other))
    assert s_same > s_other
    assert s_same > 0.99  # identical patch => cosine ~ 1
