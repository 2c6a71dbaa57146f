"""Data-parallel training over a device mesh.

The batch is sharded over the mesh's 'data' axis and params are replicated;
under jit, XLA turns the replicated-gradient requirement into a psum over
ICI — the TPU-native replacement for what a NCCL all-reduce would be in a
GPU framework (the reference has neither: single feed/run per step,
reference: src/train.py:164-166).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mccnn_tpu.pipeline.train import hinge_loss, make_optimizer
from mccnn_tpu.utils.config import TrainConfig


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a (left, pos, neg) batch with its leading dim sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(config: TrainConfig, mesh: Mesh, axis: str = "data",
                       optimizer=None):
    """Jitted DP train step: params/opt_state replicated, batch sharded."""
    if optimizer is None:
        optimizer = make_optimizer(config)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))

    @jax.jit
    def train_step(params, opt_state, batch):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharded), batch
        )
        loss, grads = jax.value_and_grad(hinge_loss)(params, batch, config.margin)
        grads = jax.tree.map(
            lambda g: jax.lax.with_sharding_constraint(g, replicated), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
