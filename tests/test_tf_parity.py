"""Feature-network parity against real TensorFlow ops.

The reference's net is TF1 conv2d VALID + bias + ReLU (+ linear last
layer) + tf.nn.l2_normalize (reference: src/model.py:33-65). With TF
available in this environment, rebuild that exact op sequence in TF eager
mode using the *shipped trained weights* and require our lax.conv stack to
match — pinning conv layout, padding, bias and normalization semantics to
the original framework, not just to our own oracle.
"""

import os

import numpy as np
import pytest

REFERENCE_CKPT = "/root/reference/data/tensorboard_log/model_epoch2000.ckpt"

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CKPT + ".index"),
    reason="reference checkpoint not mounted",
)


def _tf_features(params, image):
    """The reference graph, re-expressed in TF eager ops."""
    x = tf.constant(image[None, :, :, None], dtype=tf.float32)
    num_layers = len(params)
    for i in range(1, num_layers + 1):
        layer = params[f"conv{i}"]
        x = tf.nn.conv2d(
            x, tf.constant(layer["w"]), strides=[1, 1, 1, 1], padding="VALID"
        )
        x = tf.nn.bias_add(x, tf.constant(layer["b"]))
        if i < num_layers:
            x = tf.nn.relu(x)
    x = tf.math.l2_normalize(x, axis=-1)
    return x.numpy()[0]


def test_feature_field_matches_tensorflow(rng):
    import jax.numpy as jnp

    from mccnn_tpu.models.net import extract_features
    from mccnn_tpu.models.params import load_tf_checkpoint

    params = load_tf_checkpoint(REFERENCE_CKPT)
    image = rng.normal(size=(20, 26)).astype(np.float32)

    ours = np.asarray(extract_features(params, jnp.asarray(image)))
    padded = np.pad(image, 5)
    theirs = _tf_features(params, padded)

    assert ours.shape == theirs.shape == (20, 26, 64)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_patch_descriptors_match_tensorflow(rng):
    import jax.numpy as jnp

    from mccnn_tpu.models.net import patch_descriptors
    from mccnn_tpu.models.params import load_tf_checkpoint

    params = load_tf_checkpoint(REFERENCE_CKPT)
    patches = rng.normal(size=(4, 11, 11, 1)).astype(np.float32)

    ours = np.asarray(patch_descriptors(params, jnp.asarray(patches)))
    theirs = np.stack(
        [_tf_features(params, p[:, :, 0])[0, 0] for p in patches]
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
