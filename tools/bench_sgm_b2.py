"""Measure vertical-sweep D2 bool-volume construction strategies on TPU.

The vertical SGM sweeps materialize (D2 < sgm_d) as a full (H, W, D) bool
volume up front (ops/sgm.py::_penalty_bits). Two constructions:

  gather   — the shipped one: one constant-index jnp.take of the (H, W)
             gradient-bit plane with the banded (W, D) probe index.
  patches  — conv_general_dilated_patches over D-wide windows of the
             (lane-)flipped gradient rows -> (H, D, W), flip + transpose
             to (H, W, D); pure data movement plus one 3D transpose.

Env: H, W, D, ITERS.

MEASURED (v5e, 2000x3072x512): gather 40.9 ms, patches 90.6 ms — the
shipped gather wins (the banded probe rows are contiguous, so the
"gather" is row data movement, while patches pays a full (H, D, W) ->
(H, W, D) minor-axis transpose). ops/sgm.py keeps the gather.
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

    height = int(os.environ.get("H", "2000"))
    width = int(os.environ.get("W", "3072"))
    d_pad = int(os.environ.get("D", "512"))
    iters = int(os.environ.get("ITERS", "3"))
    sgm_d = 0.08

    rng = np.random.default_rng(0)
    grad = jnp.asarray(
        np.abs(rng.normal(size=(height, width))).astype(np.float32)
    )
    disps = jnp.arange(d_pad, dtype=jnp.int32)
    cols = jnp.arange(width, dtype=jnp.int32)[:, None]
    probe = cols - disps[None, :]
    oor = probe < 0
    idx = jnp.clip(probe, 0, width - 1)

    def gather(g):
        small = g < sgm_d
        return jnp.where(oor[None], True, jnp.take(small, idx, axis=1))

    def patches(g):
        gpad = jnp.pad(g[:, ::-1], ((0, 0), (0, d_pad)))
        pat = lax.conv_general_dilated_patches(
            gpad[:, None, :], filter_shape=(d_pad,), window_strides=(1,),
            padding="VALID",
        )[:, :, :width]  # (H, D, x): pat[h, d, x] = gflip[h, x+d]
        # column w sits at x = W-1-w; b2[h, w, d] = g[h, w-d]
        b2 = (pat < sgm_d)[:, :, ::-1].transpose(0, 2, 1)
        return jnp.where(oor[None], True, b2)

    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    outs = {}
    for name, fn in (("gather", gather), ("patches", patches)):
        jfn = jax.jit(fn)
        out = jfn(grad)
        np.asarray(sync(out))
        t0 = time.time()
        for _ in range(iters):
            out = jfn(grad)
        np.asarray(sync(out))
        dt = (time.time() - t0) / iters * 1e3
        print(f"b2 {name:8s} {dt:8.1f} ms", flush=True)
        outs[name] = np.asarray(out)
    if len(outs) == 2:
        same = (outs["gather"] == outs["patches"]).all()
        print(f"identical: {bool(same)}", flush=True)


if __name__ == "__main__":
    main()
