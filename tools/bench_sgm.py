"""Sweep the SGM scan chunk size on TPU.

The SGM sweeps are the #2 stage at both flagship shapes (218 ms half-res,
~0.85 s full-res of 8 sweeps). Each sweep is a lax.scan along dim 0 whose
step processes `sgm_chunk` lines: larger chunks amortize the ~30us/step
scan bookkeeping and per-step dynamic-slice round-trips against a longer
sequential inner loop. This tool times `_sgm_one_volume` (the chained
4-sweep reference mode, exactly what the pipeline runs per volume) across
chunk sizes.

Env: H, W, D (padded depth), NDISP, DTYPE (bf16|f32), CHUNKS (csv),
ITERS.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.sgm import _sgm_one_volume
    from mccnn_tpu.utils.config import MatchConfig

    height = int(os.environ.get("H", "1000"))
    width = int(os.environ.get("W", "1504"))
    d_pad = int(os.environ.get("D", "256"))
    ndisp = int(os.environ.get("NDISP", str(d_pad - 56)))
    dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
    chunks = [int(c) for c in os.environ.get("CHUNKS", "4,8,16,25,40").split(",")]
    iters = int(os.environ.get("ITERS", "3"))

    rng = np.random.default_rng(0)
    limg = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    rimg = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(
        rng.normal(size=(height, width, d_pad)).astype(np.float32)
    ).astype(dtype)

    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    impls = os.environ.get("IMPLS", "xla").split(",")
    for impl in impls:
        if impl == "pallas":
            from mccnn_tpu.ops.sgm_pallas import sgm_pallas_one_volume

            config = MatchConfig()
            fn = jax.jit(lambda v, li, ri: sgm_pallas_one_volume(
                v, li, ri, "L", ndisp, config))
            out = fn(vol, limg, rimg)
            np.asarray(sync(out))
            t0 = time.time()
            for _ in range(iters):
                out = fn(vol, limg, rimg)
            np.asarray(sync(out))
            dt = (time.time() - t0) / iters * 1e3
            print(f"pallas    : {dt:8.1f} ms / 4-sweep volume "
                  f"({dt / 4:6.1f} ms/sweep)", flush=True)
            if os.environ.get("CHECK"):
                ref = jax.jit(lambda v, li, ri: _sgm_one_volume(
                    v, li, ri, "L", ndisp, MatchConfig()))(vol, limg, rimg)
                diff = np.abs(
                    np.asarray(ref.astype(jnp.float32))
                    - np.asarray(out.astype(jnp.float32))
                )[:, :, :ndisp]
                print(f"pallas vs xla: max abs diff {diff.max():.3e} "
                      f"mean {diff.mean():.3e}", flush=True)
            continue
        for chunk in chunks:
            config = MatchConfig(sgm_chunk=chunk, sgm_u8=(impl == "u8"))
            fn = jax.jit(
                lambda v, li, ri: _sgm_one_volume(v, li, ri, "L", ndisp,
                                                  config)
            )
            out = fn(vol, limg, rimg)
            np.asarray(sync(out))
            t0 = time.time()
            for _ in range(iters):
                out = fn(vol, limg, rimg)
            np.asarray(sync(out))
            dt = (time.time() - t0) / iters * 1e3
            print(f"{impl} chunk {chunk:3d}: {dt:8.1f} ms / 4-sweep volume "
                  f"({dt / 4:6.1f} ms/sweep)", flush=True)
            if impl == "u8" and os.environ.get("CHECK"):
                ref = jax.jit(lambda v, li, ri: _sgm_one_volume(
                    v, li, ri, "L", ndisp,
                    MatchConfig(sgm_chunk=chunk)))(vol, limg, rimg)
                diff = np.abs(
                    np.asarray(ref.astype(jnp.float32))
                    - np.asarray(out.astype(jnp.float32))
                )[:, :, :ndisp]
                print(f"u8 vs xla: max abs diff {diff.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
