"""Hinge-loss Siamese training step.

Behavioral spec (reference: src/train.py:71-106): three weight-sharing
streams embed (left, right_pos, right_neg) 11x11 patches to unit 64-d
descriptors; scores are channel dot products (cosine, since normalized);
loss = mean(max(0, margin - s_pos + s_neg)); optimizer is SGD with momentum
(TF MomentumOptimizer: acc = beta*acc + g; w -= lr*acc — exactly optax's
sgd-with-momentum trace).

TPU design: one jitted, donated train step (value_and_grad over the fused
three-stream forward); weight sharing is a single params pytree applied
three times. For data parallelism, shard the batch over the mesh's 'data'
axis — under jit, XLA inserts the gradient all-reduce (see
mccnn_tpu.parallel).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from mccnn_tpu.models.net import Params, patch_descriptors
from mccnn_tpu.utils.config import TrainConfig

Batch = Tuple[jax.Array, jax.Array, jax.Array]  # (left, right_pos, right_neg)


def hinge_loss(
    params: Params, batch: Batch, margin: float
) -> jax.Array:
    left, right_pos, right_neg = batch
    desc_left = patch_descriptors(params, left)
    score_pos = jnp.sum(desc_left * patch_descriptors(params, right_pos), axis=-1)
    score_neg = jnp.sum(desc_left * patch_descriptors(params, right_neg), axis=-1)
    return jnp.mean(jnp.maximum(0.0, margin - score_pos + score_neg))


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.sgd(config.learning_rate, momentum=config.beta)


def make_train_step(config: TrainConfig, optimizer=None):
    """Build the jitted (params, opt_state, batch) -> (params, opt_state, loss)."""
    if optimizer is None:
        optimizer = make_optimizer(config)

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(hinge_loss)(params, batch, config.margin)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_eval_step(config: TrainConfig):
    @jax.jit
    def eval_step(params, batch):
        return hinge_loss(params, batch, config.margin)

    return eval_step
