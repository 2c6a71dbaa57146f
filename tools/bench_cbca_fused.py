"""Benchmark CBCA implementations per round on real TPU (half-res scale).

Compares the dense-mask MXU einsum (round-1 default, 3.8 GB/round mask
traffic), the VPU-stencil Pallas kernel, and the fused VMEM-mask MXU kernel
(f32 and bf16 volumes), plus a numeric cross-check of the fused kernel
against the XLA stencil on-device.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3, label=""):
    import jax
    import jax.numpy as jnp

    sync = jax.jit(lambda t: jnp.sum(jax.tree.leaves(t)[0].astype(jnp.float32)))
    out = fn(*args)
    np.asarray(sync(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(sync(out))
    print(f"{label:46s} {(time.time() - t0) / iters * 1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cbca_fused import cbca_fused
    from mccnn_tpu.ops.cbca_mxu import cbca_mxu

    height = int(os.environ.get("H", "1000"))
    width = int(os.environ.get("W", "1504"))
    d_pad = int(os.environ.get("D", "256"))
    iters = int(os.environ.get("CBCA_ITERS", "4"))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(
        rng.normal(size=(height, width, d_pad)).astype(np.float32)
    )
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)
    arms = jax.tree.map(lambda x: x.block_until_ready(), arms)

    n = iters
    tile_h = int(os.environ.get("TILE_H", "16"))
    tile_w = int(os.environ.get("TILE_W", "128"))
    tile_d = int(os.environ.get("TILE_D", "128"))
    out_bufs = int(os.environ.get("OUT_BUFS", "2"))
    kw = dict(tile_h=tile_h, tile_w=tile_w, tile_d=tile_d, out_bufs=out_bufs)
    if "BSPLIT" in os.environ:
        b = os.environ["BSPLIT"]
        kw["bsplit"] = None if b in ("none", "0") else int(b)
    if "P2PREC" in os.environ:  # phase-2 matmul precision: default|high|highest
        kw["phase2_precision"] = os.environ["P2PREC"]
    if os.environ.get("DSPLIT") == "1":  # (D/td, H, W, td) volume layout
        kw["dsplit"] = True
    variants = os.environ.get("VARIANTS", "mxu,fused,fused16,check").split(",")
    if "mxu" in variants:
        timed(jax.jit(lambda v, a: cbca_mxu(v, a, n, 14)), vol, arms,
              label=f"cbca mxu dense masks        x{n} iters")
    if "fused" in variants:
        timed(jax.jit(lambda v, a: cbca_fused(v, a, n, 14, **kw)), vol, arms,
              label=f"cbca fused f32 th{tile_h} tw{tile_w} td{tile_d} ob{out_bufs} x{n}")
    if "fused16" in variants:
        vol16 = vol.astype(jnp.bfloat16)
        timed(jax.jit(lambda v, a: cbca_fused(v, a, n, 14, **kw)), vol16, arms,
              label=f"cbca fused bf16 th{tile_h} tw{tile_w} td{tile_d} ob{out_bufs} x{n}")
    if "fused8" in variants:
        # int8 storage (half the DMA bytes of bf16 on the DMA-bound round);
        # quant/dequant bracket the n-round loop inside the call
        timed(jax.jit(lambda v, a: cbca_fused(
            v, a, n, 14, int8_storage=True, **kw)), vol, arms,
              label=f"cbca fused int8 th{tile_h} tw{tile_w} td{tile_d} x{n}")
    if "mixed" in variants:
        # f32 storage, bf16 phase-1 multiplies (cbca_impl="fused16")
        timed(jax.jit(lambda v, a: cbca_fused(
            v, a, n, 14, compute_dtype=jnp.bfloat16, **kw)), vol, arms,
              label=f"cbca fused mixed th{tile_h} tw{tile_w} td{tile_d} ob{out_bufs} x{n}")
    if "fused2" in variants or "fused2_16" in variants:
        from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

        f2kw = dict(tile_h=tile_h, tile_w=tile_w, tile_d=tile_d,
                    out_bufs=out_bufs)
        if "P2PREC" in os.environ:
            f2kw["phase2_precision"] = os.environ["P2PREC"]
        if "fused2" in variants:
            timed(jax.jit(lambda v, a: cbca_fused_two(v, a, n, 14, **f2kw)),
                  vol, arms,
                  label=f"cbca fused2 f32 th{tile_h} tw{tile_w} td{tile_d} x{n}")
        if "fused2_16" in variants:
            vol16 = vol.astype(jnp.bfloat16)
            timed(jax.jit(lambda v, a: cbca_fused_two(v, a, n, 14, **f2kw)),
                  vol16, arms,
                  label=f"cbca fused2 bf16 th{tile_h} tw{tile_w} td{tile_d} x{n}")
    if "checkfused2" in variants:
        from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

        f2kw = dict(tile_h=tile_h, tile_w=tile_w, tile_d=tile_d)
        ref = np.asarray(jax.jit(lambda v, a: cbca(v, a, 2, 14))(vol, arms))
        got = np.asarray(jax.jit(
            lambda v, a: cbca_fused_two(v, a, 2, 14, **f2kw))(vol, arms))
        diff = np.abs(got - ref)
        rel = diff / (np.abs(ref) + 1.0)
        print(f"fused2-vs-xla f32 (2 rounds): max abs {diff.max():.3e} "
              f"max rel(+1) {rel.max():.3e}", flush=True)
        vol16 = vol.astype(jnp.bfloat16)
        refq = np.asarray(jax.jit(
            lambda v, a: cbca(v.astype(jnp.float32), a, 2, 14))(vol16, arms))
        got16 = np.asarray(jax.jit(
            lambda v, a: cbca_fused_two(v, a, 2, 14, **f2kw))(vol16, arms)
        ).astype(np.float32)
        diff = np.abs(got16 - refq)
        print(
            f"fused2 bf16 abs diff vs xla(quantized input): max "
            f"{diff.max():.3e} p99.9 {np.percentile(diff, 99.9):.3e} "
            f"mean {diff.mean():.3e}", flush=True)
    if "rolling" in variants or "rolling16" in variants:
        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

        rkw = dict(tile_h=tile_h, tile_w=tile_w, tile_d=tile_d)
        if "P2PREC" in os.environ:
            rkw["phase2_precision"] = os.environ["P2PREC"]
        if "rolling" in variants:
            timed(jax.jit(lambda v, a: cbca_fused_rolling(v, a, n, 14, **rkw)),
                  vol, arms,
                  label=f"cbca rolling f32 th{tile_h} tw{tile_w} td{tile_d} x{n}")
        if "rolling16" in variants:
            vol16 = vol.astype(jnp.bfloat16)
            timed(jax.jit(lambda v, a: cbca_fused_rolling(v, a, n, 14, **rkw)),
                  vol16, arms,
                  label=f"cbca rolling bf16 th{tile_h} tw{tile_w} td{tile_d} x{n}")
    if "xla" in variants:
        timed(jax.jit(lambda v, a: cbca(v, a, n, 14)), vol, arms,
              label=f"cbca xla stencil            x{n} iters")

    # On-device numeric cross-checks (Mosaic semantics vs the exact XLA
    # stencil, 1 round). bf16 variants are judged in ABSOLUTE terms against
    # the stencil run on the identically-quantized input: a
    # |diff|/(|ref|+eps) metric spikes wherever the aggregated cost crosses
    # zero and condemns any bf16 variant regardless of correctness
    # (measured: rel-err "5.41" that was max abs diff 7.8e-3 = one bf16
    # ulp at |value|~1 — see CLAUDE.md).
    if "check" in variants:
        ref = np.asarray(jax.jit(lambda v, a: cbca(v, a, 1, 14))(vol, arms))
        got = np.asarray(
            jax.jit(lambda v, a: cbca_fused(v, a, 1, 14, **kw))(vol, arms)
        )
        err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3))
        print(f"fused-vs-xla max rel err (1 round, f32): {err:.2e}", flush=True)
    if "check16" in variants:
        vol16 = vol.astype(jnp.bfloat16)
        refq = np.asarray(jax.jit(
            lambda v, a: cbca(v.astype(jnp.float32), a, 1, 14))(vol16, arms))
        got16 = np.asarray(
            jax.jit(lambda v, a: cbca_fused(v, a, 1, 14, **kw))(vol16, arms)
        ).astype(np.float32)
        diff = np.abs(got16 - refq)
        print(
            f"bf16 abs diff vs xla(quantized input): max {diff.max():.3e} "
            f"p99.9 {np.percentile(diff, 99.9):.3e} mean {diff.mean():.3e} "
            f"(ref mean |value| {float(np.abs(refq).mean()):.3e})",
            flush=True)
    if "checkint8" in variants:
        # the int8 kernel is exact integer math: it must equal the XLA
        # int8 simulation BIT-FOR-BIT on device (absolute comparison on
        # the identically-quantized input, per CLAUDE.md methodology)
        from mccnn_tpu.ops.cbca_fused import cbca_int8_xla

        ref8 = np.asarray(jax.jit(
            lambda v, a: cbca_int8_xla(v, a, 2, 14))(vol, arms))
        got8 = np.asarray(jax.jit(lambda v, a: cbca_fused(
            v, a, 2, 14, int8_storage=True, **kw))(vol, arms))
        diff = np.abs(got8 - ref8)
        print(
            f"int8 kernel vs xla int8 sim (2 rounds): max {diff.max():.3e} "
            f"exact-equal {np.mean(got8 == ref8):.6f}", flush=True)
    if "checkroll" in variants:
        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

        rkw = dict(tile_h=tile_h, tile_w=tile_w, tile_d=tile_d)
        ref = np.asarray(jax.jit(lambda v, a: cbca(v, a, 1, 14))(vol, arms))
        got = np.asarray(jax.jit(
            lambda v, a: cbca_fused_rolling(v, a, 1, 14, **rkw))(vol, arms))
        diff = np.abs(got - ref) / (np.abs(ref) + 1e-3)
        print(f"rolling-vs-xla max rel err (1 round, f32): {diff.max():.2e}",
              flush=True)
        vol16 = vol.astype(jnp.bfloat16)
        refq = np.asarray(jax.jit(
            lambda v, a: cbca(v.astype(jnp.float32), a, 1, 14))(vol16, arms))
        got16 = np.asarray(jax.jit(
            lambda v, a: cbca_fused_rolling(v, a, 1, 14, **rkw))(vol16, arms)
        ).astype(np.float32)
        diff = np.abs(got16 - refq)
        print(
            f"rolling bf16 abs diff vs xla(quantized input): max "
            f"{diff.max():.3e} p99.9 {np.percentile(diff, 99.9):.3e} "
            f"mean {diff.mean():.3e}", flush=True)
    if "checkmixed" in variants:
        ref = np.asarray(jax.jit(lambda v, a: cbca(v, a, 1, 14))(vol, arms))
        gotm = np.asarray(jax.jit(lambda v, a: cbca_fused(
            v, a, 1, 14, compute_dtype=jnp.bfloat16, **kw))(vol, arms))
        diff = np.abs(gotm - ref)
        print(
            f"mixed abs diff vs xla(f32 input): max {diff.max():.3e} "
            f"p99.9 {np.percentile(diff, 99.9):.3e} mean {diff.mean():.3e} "
            f"(ref mean |value| {float(np.abs(ref).mean()):.3e})",
            flush=True)


if __name__ == "__main__":
    main()
