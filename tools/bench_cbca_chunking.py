"""Measure the XLA-level overhead of d-chunking around the fused CBCA kernel.

The full-res schedule wraps ops/cbca_fused in pipeline-level d-chunking
(`MatchPipeline cbca_chunk_d=256`): a fori_loop that dynamic-slices a
(H, W, chunk) block out of the volume, aggregates it, and
dynamic-update-slices it back. Every one of those ops is HBM traffic the
kernel itself does not need — and minor-axis dynamic_update_slice on a
fori carry may recopy the whole volume (CLAUDE.md documents that for
middle-axis scan carries; this tool measures the minor-axis case).

Variants (all donate the volume, matching the pipeline's liveness):
  fori    — the shipped formulation (dynamic slice + update in a fori_loop)
  unroll  — static python loop, lax.slice_in_dim + one jnp.concatenate
  whole   — single un-chunked kernel call (D = full depth), the lower bound
            (known to OOM at true full-res; default shape here is half
            that, H=1000, to let it compile for the comparison)

Env: H, W, D (padded depth), CK (chunk), ITERS, VARIANTS.
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
    from jax import lax

    from mccnn_tpu.ops.cbca import compute_arms
    from mccnn_tpu.ops.cbca_fused import cbca_fused

    height = int(os.environ.get("H", "1000"))
    width = int(os.environ.get("W", "3008"))
    d_pad = int(os.environ.get("D", "512"))
    ck = int(os.environ.get("CK", "256"))
    iters = int(os.environ.get("ITERS", "4"))
    dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
    variants = os.environ.get("VARIANTS", "fori,unroll,whole").split(",")

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(
        rng.normal(size=(height, width, d_pad)).astype(np.float32)
    ).astype(dtype)
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)
    arms = jax.tree.map(lambda x: x.block_until_ready(), arms)

    def fori(volume, arms):
        def body(c, v):
            start = c * ck
            block = lax.dynamic_slice_in_dim(v, start, ck, axis=2)
            block = cbca_fused(block, arms, iters, 14)
            return lax.dynamic_update_slice_in_dim(v, block, start, axis=2)

        return lax.fori_loop(0, d_pad // ck, body, volume)

    def unroll(volume, arms):
        blocks = [
            cbca_fused(
                lax.slice_in_dim(volume, c * ck, (c + 1) * ck, axis=2),
                arms, iters, 14,
            )
            for c in range(d_pad // ck)
        ]
        return jnp.concatenate(blocks, axis=2)

    def whole(volume, arms):
        return cbca_fused(volume, arms, iters, 14)

    fns = {"fori": fori, "unroll": unroll, "whole": whole}
    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    for name in variants:
        fn = jax.jit(fns[name], donate_argnums=0)
        try:
            out = fn(jnp.copy(vol), arms)
            np.asarray(sync(out))
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = fn(jnp.copy(vol), arms)
            np.asarray(sync(out))
            dt = (time.time() - t0) / reps * 1e3
            print(f"cbca chunking {name:7s} ck{ck} x{iters} iters "
                  f"{dt:9.1f} ms", flush=True)
        except Exception as exc:  # OOM at scale is an expected outcome
            print(f"cbca chunking {name:7s} FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
