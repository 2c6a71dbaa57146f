"""Benchmark the Pallas kernels vs their XLA counterparts on real TPU."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3, label=""):
    import jax
    import jax.numpy as jnp

    sync = jax.jit(lambda t: jnp.sum(jax.tree.leaves(t)[0]))
    out = fn(*args)
    np.asarray(sync(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(sync(out))
    print(f"{label:44s} {(time.time() - t0) / iters * 1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cbca_pallas import cbca_pallas
    from mccnn_tpu.ops.cost_volume import cost_volume_pair
    from mccnn_tpu.ops.cost_volume_pallas import band_pair_pallas

    height, width, ndisp, d_pad = 1000, 1504, 200, 256
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))

    timed(
        jax.jit(lambda a, b: band_pair_pallas(a, b, d_pad)),
        fl, fr, label="pallas band pair (raw scores)",
    )
    timed(
        jax.jit(lambda a, b: cost_volume_pair(a, b, ndisp, method="pallas")),
        fl, fr, label="cost_volume_pair method=pallas",
    )

    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(
        rng.normal(size=(height, width, d_pad)).astype(np.float32)
    )
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)
    timed(jax.jit(lambda v, a: cbca(v, a, 1, 14)), vol, arms,
          label="cbca xla stencil x1 iter")
    timed(jax.jit(lambda v, a: cbca_pallas(v, a, 1, 14)), vol, arms,
          label="cbca pallas x1 iter")
    timed(jax.jit(lambda v, a: cbca_pallas(v, a, 16, 14)), vol, arms,
          iters=1, label="cbca pallas x16 iters")

    a = np.asarray(jax.jit(lambda v, ar: cbca(v, ar, 2, 14))(vol, arms))
    b = np.asarray(jax.jit(lambda v, ar: cbca_pallas(v, ar, 2, 14))(vol, arms))
    print("cbca xla vs pallas max rel diff:",
          float(np.max(np.abs(a - b) / (np.abs(a) + 1e-3))), flush=True)


if __name__ == "__main__":
    main()


def bench_mxu():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cbca_mxu import cbca_mxu

    height, width, d_pad = 1000, 1504, 256
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(
        rng.normal(size=(height, width, d_pad)).astype(np.float32)
    )
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)
    timed(jax.jit(lambda v, a: cbca_mxu(v, a, 1, 14)), vol, arms,
          label="cbca MXU x1 iter")
    timed(jax.jit(lambda v, a: cbca_mxu(v, a, 16, 14)), vol, arms,
          iters=1, label="cbca MXU x16 iters")
    a = np.asarray(jax.jit(lambda v, ar: cbca(v, ar, 2, 14))(vol, arms))
    b = np.asarray(jax.jit(lambda v, ar: cbca_mxu(v, ar, 2, 14))(vol, arms))
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    print(f"cbca exact vs MXU: max rel {rel.max():.4f} mean rel {rel.mean():.6f}",
          flush=True)
