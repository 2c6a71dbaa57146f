"""MC-CNN *fast architecture* feature network, TPU-first.

Behavioral spec (reference: src/model.py:33-65): five 3x3 VALID convolutions
with 64 maps, ReLU on all but the last, then L2 normalization over channels.
An 11x11 patch maps to a single 64-d unit descriptor; a zero-padded
(H+10)x(W+10) image maps to an HxWx64 descriptor field — the
fully-convolutional trick the matcher relies on
(reference: src/process_functional.py:15-31).

TPU design notes:
  * Parameters are a plain pytree ``{"conv1": {"w": (3,3,cin,64), "b": (64,)}, ...}``.
    Siamese weight sharing (reference: src/model.py:98 via AUTO_REUSE) is free
    here — the same pytree is applied to each of the three patch streams.
  * The stack is pure ``lax.conv_general_dilated`` in NHWC; XLA maps these
    convs onto the MXU and fuses bias+ReLU. No per-image graph rebuilding
    (the reference builds a new TF graph + Session per image,
    reference: src/process_functional.py:28-43).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from mccnn_tpu.utils.config import NetConfig

Params = Dict[str, Dict[str, Any]]

# tf.nn.l2_normalize's epsilon (the reference normalizes at src/model.py:64)
_L2_NORMALIZE_EPS = 1e-12


def init_params(
    key: jax.Array, config: NetConfig = NetConfig(), dtype=jnp.float32
) -> Params:
    """Glorot-uniform weights, zero biases (TF1 get_variable defaults)."""
    params: Params = {}
    cin = config.input_channels
    k = config.kernel_size
    initializer = jax.nn.initializers.glorot_uniform()
    for i in range(1, config.num_layers + 1):
        key, sub = jax.random.split(key)
        groups = config.groups if i > 1 else 1  # layer 1 input is 1-channel
        params[f"conv{i}"] = {
            "w": initializer(sub, (k, k, cin // groups, config.num_maps), dtype),
            "b": jnp.zeros((config.num_maps,), dtype),
        }
        cin = config.num_maps
    return params


def _conv_stack(params: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """VALID conv stack on NHWC input; ReLU on all layers but the last.

    Grouped convolution (the reference's conv() supports it via split/
    concat, reference: src/model.py:106-114) is expressed by kernels whose
    input-channel extent divides the activations': XLA's
    feature_group_count — no splitting needed.

    ``compute_dtype=bfloat16`` runs the convs with bf16 operands and f32
    accumulation (bias/ReLU/normalize stay f32-exact per layer before the
    next layer's bf16 cast) — the MXU's native rate. The fast matching
    schedules use it: their band correlation quantizes the features to
    bf16 inside the dot anyway, so the only numerics added is the
    per-layer activation rounding.
    """
    num_layers = len(params)
    bf16 = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    for i in range(1, num_layers + 1):
        layer = params[f"conv{i}"]
        cin = x.shape[-1]
        w = layer["w"]
        groups = cin // w.shape[2]
        if bf16:
            x = x.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        x = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32 if bf16 else None,
        )
        x = x + layer["b"]
        if i < num_layers:
            x = jnp.maximum(x, 0.0)
    return x


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """x / sqrt(max(sum(x^2), eps)) — tf.nn.l2_normalize semantics."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(jnp.maximum(sq, _L2_NORMALIZE_EPS))


def patch_descriptors(params: Params, patches: jax.Array) -> jax.Array:
    """(B, p, p, 1) training patches -> (B, 64) unit descriptors.

    Equivalent to the reference's training-time forward + squeeze
    (reference: src/train.py:76-82).
    """
    features = _conv_stack(params, patches)
    features = l2_normalize(features, axis=-1)
    return features.reshape(features.shape[0], features.shape[-1])


def extract_features(params: Params, image: jax.Array,
                     compute_dtype=None) -> jax.Array:
    """(H, W) standardized image -> (H, W, 64) unit descriptor field (f32).

    Zero-pads by (patch-1)/2 on each side so the VALID stack returns one
    descriptor per input pixel (reference: src/process_functional.py:19-31).
    ``compute_dtype`` — see ``_conv_stack``; the L2 normalize always runs
    f32 and the descriptors return f32 either way.
    """
    num_layers = len(params)
    k = params["conv1"]["w"].shape[0]
    pad = (num_layers * (k - 1)) // 2
    x = jnp.pad(image, ((pad, pad), (pad, pad)))[None, :, :, None]
    features = _conv_stack(params, x, compute_dtype)
    features = l2_normalize(features.astype(jnp.float32), axis=-1)
    return features[0]
