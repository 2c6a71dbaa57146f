"""Benchmark the single-band cost-volume kernel (the production path).

The bf16 schedules build one volume at a time via
``band_pair_pallas(sides="left"/"right")`` — this times exactly that call
(bf16 out, finalize_ndisp set, DEFAULT-precision dot), per side. BASELINE
references: half-res side ~19.7 ms isolated pre-prefetch (H=1000 proxy),
full-width side ~53 ms.

Env: H, W, NDISP, TILE_H, ITERS, DTYPE (bf16|f32), SIDE (left|right|both).
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

    from mccnn_tpu.ops.cost_volume_pallas import band_pair_pallas

    height = int(os.environ.get("H", "1000"))
    width = int(os.environ.get("W", "1504"))
    ndisp = int(os.environ.get("NDISP", "200"))
    tile_h = int(os.environ.get("TILE_H", "32"))
    iters = int(os.environ.get("ITERS", "8"))
    out_dtype = (jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16"
                 else jnp.float32)
    sides = os.environ.get("SIDE", "left")
    d_pad = -(-ndisp // 128) * 128

    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))
    if out_dtype == jnp.bfloat16:
        fl, fr = fl.astype(jnp.bfloat16), fr.astype(jnp.bfloat16)

    fn = jax.jit(lambda a, b: band_pair_pallas(
        a, b, d_pad, tile_h=tile_h, sides=sides, out_dtype=out_dtype,
        finalize_ndisp=ndisp,
    ))
    sync = jax.jit(lambda t: jnp.sum(
        jax.tree.leaves(t)[0].astype(jnp.float32)))
    out = fn(fl, fr)
    np.asarray(sync(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(fl, fr)
    np.asarray(sync(out))
    per_call = (time.time() - t0) / iters * 1e3
    print(f"band {sides} ({height}x{width} ndisp {ndisp} d_pad {d_pad} "
          f"{os.environ.get('DTYPE', 'bf16')}, th{tile_h}): "
          f"{per_call:.2f} ms/side", flush=True)


if __name__ == "__main__":
    main()
