"""Row-sharded CBCA with explicit ICI halo exchange (shard_map).

The GSPMD path (parallel/match.py) lets XLA infer the communication; this
module is the hand-scheduled alternative: the volume is sharded over rows,
and each aggregation round exchanges exactly the radius-13 halo rows with
ring neighbors via ``lax.ppermute`` before running the purely-local
separable stencils. ``ppermute`` leaves non-receiving shards zeros, which
is exactly the zero-halo convention the stencil expects at image borders
— so edge shards need no special casing.

This is the template for sharding the single-device Pallas kernels too
(shard_map body per shard); the stencil here is the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from mccnn_tpu.ops.cbca import CrossArms, _arm_stencil_sum


def _exchange_halo(local: jax.Array, radius: int, axis_name: str) -> jax.Array:
    """(Hl, ...) -> (Hl + 2*radius, ...) with neighbor rows (zeros at ends)."""
    num = lax.axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(num - 1)]
    bwd = [(i + 1, i) for i in range(num - 1)]
    top = lax.ppermute(local[-radius:], axis_name, perm=fwd)
    bottom = lax.ppermute(local[:radius], axis_name, perm=bwd)
    return jnp.concatenate([top, local, bottom], axis=0)


def cbca_sharded(
    volume: jax.Array,
    arms: CrossArms,
    num_iterations: int,
    distance_threshold: int,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Aggregate a row-sharded (H, W, D) volume; semantics == ops.cbca.cbca.

    Requires H divisible by the mesh axis size and the shard height
    >= distance_threshold - 1 (single-hop halos).
    """
    if num_iterations == 0:
        return volume
    radius = distance_threshold - 1
    height = volume.shape[0]
    num_shards = mesh.shape[axis]
    if height % num_shards != 0:
        raise ValueError(f"H ({height}) must divide over {num_shards} shards")
    if height // num_shards < radius:
        raise ValueError("shard height smaller than the halo radius")

    vol_spec = P(axis, None, None)
    plane_spec = P(axis, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(vol_spec, plane_spec, plane_spec, plane_spec, plane_spec),
        out_specs=vol_spec,
    )
    def run(vol, arm_l, arm_r, arm_u, arm_d):
        # the region normalizer needs the halo'd horizontal counts
        h_count = (arm_l + arm_r + 1).astype(jnp.float32)
        h_count_h = _exchange_halo(h_count, radius, axis)
        arm_u_h = jnp.pad(arm_u, ((radius, radius), (0, 0)))
        arm_d_h = jnp.pad(arm_d, ((radius, radius), (0, 0)))
        region = _arm_stencil_sum(
            h_count_h, arm_u_h, arm_d_h, axis=0,
            distance_threshold=distance_threshold,
        )[radius:-radius]
        inv_region = (1.0 / region)[..., None]

        arm_l_h = _exchange_halo(arm_l, radius, axis)
        arm_r_h = _exchange_halo(arm_r, radius, axis)

        def one_round(_, v):
            v_h = _exchange_halo(v, radius, axis)
            mid = _arm_stencil_sum(
                v_h, arm_l_h, arm_r_h, axis=1,
                distance_threshold=distance_threshold,
            )
            out = _arm_stencil_sum(
                mid, arm_u_h, arm_d_h, axis=0,
                distance_threshold=distance_threshold,
            )[radius:-radius]
            return out * inv_region

        return lax.fori_loop(0, num_iterations, one_round, vol)

    sharding = NamedSharding(mesh, vol_spec)
    volume = jax.device_put(volume, sharding)
    return run(volume, arms.left, arms.right, arms.up, arms.down)