"""shard_map wrappers that run the Pallas kernels per shard.

The manual-DMA Pallas kernels (ops/cost_volume_pallas.py,
ops/cbca_fused.py) are single-device programs — GSPMD cannot partition
them, which round 1 worked around by forcing the slower XLA paths in the
sharded matcher. These wrappers restore the fast kernels under sharding:

  * cost volume: rows are independent (the correlation spans columns of
    the same row only), so the band kernel runs per row-shard with no
    communication at all.
  * fused CBCA: each round exchanges exactly the radius-13 halo rows with
    ring neighbors via ``lax.ppermute`` (zeros at the global edges — the
    zero-arm convention means halo garbage is gated off anyway), then runs
    one fused-kernel round on the extended block and crops.

Both compose with the GSPMD-partitioned remainder of the pipeline (SGM
scans, WTA, postprocess) inside one jit: shard_map regions are explicit
manual-sharding islands within the sharding-constraint program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from mccnn_tpu.ops.cbca import CrossArms
from mccnn_tpu.ops.cbca_fused import cbca_fused
from mccnn_tpu.ops.cost_volume import cost_volume_pair
from mccnn_tpu.parallel.cbca import _exchange_halo


def make_sharded_cost_volume_fn(
    ndisp: int, mesh: Mesh, axis: str = "data", dtype=None
):
    """A ``cost_volume_fn(fl, fr, sides)`` hook running the Pallas band
    kernel per row shard (no halo — rows are independent)."""
    feat_spec = P(axis, None, None)

    def fn(features_left, features_right, sides):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(feat_spec, feat_spec),
            out_specs=P(axis, None, None),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        def run(fl, fr):
            return cost_volume_pair(
                fl, fr, ndisp, method="pallas", sides=sides, dtype=dtype
            )

        return run(features_left, features_right)

    return fn


def make_sharded_cbca_fn(
    distance_threshold: int, mesh: Mesh, axis: str = "data",
    impl: str = "fused",
):
    """A ``cbca_fn(volume, arms, iterations)`` hook: per-round halo
    exchange + one fused-kernel round per shard.

    Semantics match ops.cbca.cbca exactly: the arm planes are halo'd once
    (ppermute zero-fill at the global edges == zero arms, which aggregate
    nothing), the volume per round; each shard runs the single-device
    fused kernel on its extended block and keeps the interior rows.
    """
    radius = distance_threshold - 1
    vol_spec = P(axis, None, None)
    plane_spec = P(axis, None)
    rounds_per_pass = 1
    if impl == "fused":
        aggregate = cbca_fused
    elif impl == "fused16":
        aggregate = functools.partial(cbca_fused, compute_dtype=jnp.bfloat16)
    elif impl in ("fused2", "fused2_16"):
        # two rounds per exchanged-halo pass: the halo is 2*radius and the
        # kernel computes round k+1 from round k in VMEM (ops/cbca_fused2)
        from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

        aggregate = (
            functools.partial(cbca_fused_two, compute_dtype=jnp.bfloat16)
            if impl == "fused2_16"
            else cbca_fused_two
        )
        rounds_per_pass = 2
    elif impl in ("rolling", "rolling16"):
        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

        aggregate = (
            functools.partial(cbca_fused_rolling, compute_dtype=jnp.bfloat16)
            if impl == "rolling16"
            else cbca_fused_rolling
        )
    elif impl == "fused8":
        # int8 storage: fn() quantizes ONCE globally below (plain GSPMD
        # ops, so every shard shares the scale) and the per-shard kernel
        # runs raw integer rounds on the pre-quantized i8 volume —
        # sharded output is bit-equal to the unsharded fused8 path
        aggregate = functools.partial(cbca_fused, int8_storage=True)
    elif impl == "pallas":
        from mccnn_tpu.ops.cbca_pallas import cbca_pallas as aggregate
    else:
        raise ValueError(f"not a Pallas CBCA impl: {impl}")

    def fn(volume, arms: CrossArms, num_iterations: int):
        if num_iterations == 0:
            return volume
        halo = radius * rounds_per_pass
        n_passes, rem = divmod(num_iterations, rounds_per_pass)
        num_shards = mesh.shape[axis]
        height = volume.shape[0]
        if height % num_shards or (height // num_shards) < halo:
            raise ValueError(
                f"H={height} must divide over {num_shards} shards with "
                f"shard height >= the halo {halo}"
            )

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(vol_spec, plane_spec, plane_spec, plane_spec,
                      plane_spec),
            out_specs=vol_spec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        def run(vol, arm_l, arm_r, arm_u, arm_d):
            arms_h = CrossArms(
                up=_exchange_halo(arm_u, halo, axis),
                down=_exchange_halo(arm_d, halo, axis),
                left=_exchange_halo(arm_l, halo, axis),
                right=_exchange_halo(arm_r, halo, axis),
            )

            def one_pass(_, v):
                v_h = _exchange_halo(v, halo, axis)
                out = aggregate(v_h, arms_h, rounds_per_pass,
                                distance_threshold)
                return out[halo:-halo]

            vol = lax.fori_loop(0, n_passes, one_pass, vol)
            if rem:
                # remainder rounds use a radius*rem halo; re-slice the
                # arm planes to the matching extension
                trim = halo - radius * rem
                arms_r = CrossArms(
                    *(p[trim:-trim] if trim else p for p in arms_h)
                )
                v_h = _exchange_halo(vol, radius * rem, axis)
                out = aggregate(v_h, arms_r, rem, distance_threshold)
                vol = out[radius * rem:-radius * rem]
            return vol

        if impl == "fused8":
            from mccnn_tpu.ops.cbca_fused import (
                _dequantize_int8,
                _quantize_int8,
            )

            q, scale = _quantize_int8(volume)
            out = run(q, arms.left, arms.right, arms.up, arms.down)
            return _dequantize_int8(out, scale, volume.dtype)
        return run(volume, arms.left, arms.right, arms.up, arms.down)

    return fn
