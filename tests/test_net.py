import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import (
    extract_features,
    init_params,
    load_params,
    load_reference_npy_dict,
    patch_descriptors,
    save_params,
    save_reference_npy_dict,
)
from mccnn_tpu.utils.config import NetConfig


def _params():
    return init_params(jax.random.key(0))


def test_patch_descriptor_shape_and_norm(rng):
    params = _params()
    patches = jnp.asarray(rng.normal(size=(4, 11, 11, 1)).astype(np.float32))
    desc = patch_descriptors(params, patches)
    assert desc.shape == (4, 64)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-5)


def test_feature_field_shape(rng):
    params = _params()
    image = jnp.asarray(rng.normal(size=(20, 30)).astype(np.float32))
    feats = extract_features(params, image)
    assert feats.shape == (20, 30, 64)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)


def test_fully_convolutional_equivalence(rng):
    """The core trick: descriptor at (h, w) of the padded full image equals
    the descriptor of the 11x11 patch centered there (zero padding included),
    matching reference: src/process_functional.py:15-31 semantics."""
    params = _params()
    image = rng.normal(size=(16, 18)).astype(np.float32)
    feats = np.asarray(extract_features(params, jnp.asarray(image)))

    padded = np.pad(image, 5)
    for h, w in [(0, 0), (7, 9), (15, 17), (3, 12)]:
        patch = padded[h: h + 11, w: w + 11][None, :, :, None]
        desc = np.asarray(patch_descriptors(params, jnp.asarray(patch)))[0]
        np.testing.assert_allclose(feats[h, w], desc, atol=1e-5)


def test_receptive_field_matches_patch():
    config = NetConfig()
    assert config.receptive_field + 1 == config.patch_size


def test_params_npz_round_trip(tmp_path):
    params = _params()
    path = str(tmp_path / "w.npz")
    save_params(params, path)
    loaded = load_params(path)
    for name in params:
        np.testing.assert_array_equal(loaded[name]["w"], params[name]["w"])
        np.testing.assert_array_equal(loaded[name]["b"], params[name]["b"])


def test_reference_npy_dict_round_trip(tmp_path):
    params = _params()
    path = str(tmp_path / "pretrain.npy")
    save_reference_npy_dict(params, path)
    loaded = load_reference_npy_dict(path)
    for name in params:
        np.testing.assert_array_equal(loaded[name]["w"], params[name]["w"])
        np.testing.assert_array_equal(loaded[name]["b"], params[name]["b"])


def test_grouped_conv_support(rng):
    """C2 parity: grouped conv splits channels like the reference's
    split/concat path (reference: src/model.py:106-114)."""
    from mccnn_tpu.models.net import _conv_stack

    config = NetConfig(num_layers=2, num_maps=8, groups=2)
    params = init_params(jax.random.key(0), config)
    assert params["conv2"]["w"].shape == (3, 3, 4, 8)

    x = jnp.asarray(rng.normal(size=(2, 11, 11, 1)).astype(np.float32))
    out = _conv_stack(params, x)
    assert out.shape == (2, 7, 7, 8)

    # equivalence with the reference's explicit split/concat formulation
    import jax as _jax

    h1 = _jax.lax.conv_general_dilated(
        x, params["conv1"]["w"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv1"]["b"]
    h1 = jnp.maximum(h1, 0.0)
    halves_in = jnp.split(h1, 2, axis=3)
    halves_w = jnp.split(params["conv2"]["w"], 2, axis=3)
    outs = [
        _jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        for xi, wi in zip(halves_in, halves_w)
    ]
    expected = jnp.concatenate(outs, axis=3) + params["conv2"]["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
