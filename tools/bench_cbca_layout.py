"""Compare CBCA stencil cost in (H, W, D) vs (H, D, W) layouts on TPU."""

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
    from jax import lax

    from mccnn_tpu.ops.cbca import cbca, compute_arms

    height, width, d_pad = 1000, 1504, 256
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(rng.normal(size=(height, width, d_pad)).astype(np.float32))
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)

    def cbca_hdw(volume, arms, iters, dist=14):
        """Same stencil math, (H, D, W) layout: w-shifts on the lane axis."""
        radius = dist - 1
        vol_t = jnp.transpose(volume, (0, 2, 1))  # (H, D, W)

        h_count = (arms.left + arms.right + 1).astype(jnp.float32)
        # region size via the (H, W) plane stencil (cheap)
        from mccnn_tpu.ops.cbca import _arm_stencil_sum
        region = _arm_stencil_sum(h_count, arms.up, arms.down, 0, dist)
        inv_region = (1.0 / region)[:, None, :]  # (H, 1, W)

        gates_l = [(arms.left >= o)[:, None, :] for o in range(1, dist)]
        gates_r = [(arms.right >= o)[:, None, :] for o in range(1, dist)]
        gates_u = [(arms.up >= o)[:, None, :] for o in range(1, dist)]
        gates_d = [(arms.down >= o)[:, None, :] for o in range(1, dist)]

        def one_round(_, v):
            pw = jnp.pad(v, ((0, 0), (0, 0), (radius, radius)))
            mid = v
            for o in range(1, dist):
                mid = mid + jnp.where(
                    gates_r[o - 1],
                    lax.slice_in_dim(pw, radius + o, radius + o + width, axis=2),
                    0.0,
                )
                mid = mid + jnp.where(
                    gates_l[o - 1],
                    lax.slice_in_dim(pw, radius - o, radius - o + width, axis=2),
                    0.0,
                )
            ph = jnp.pad(mid, ((radius, radius), (0, 0), (0, 0)))
            out = mid
            for o in range(1, dist):
                out = out + jnp.where(
                    gates_d[o - 1],
                    lax.slice_in_dim(ph, radius + o, radius + o + height, axis=0),
                    0.0,
                )
                out = out + jnp.where(
                    gates_u[o - 1],
                    lax.slice_in_dim(ph, radius - o, radius - o + height, axis=0),
                    0.0,
                )
            return out * inv_region

        out = lax.fori_loop(0, iters, one_round, vol_t)
        return jnp.transpose(out, (0, 2, 1))

    timed(jax.jit(lambda v, a: cbca(v, a, 1, 14)), vol, arms,
          label="cbca xla (H,W,D) x1")
    timed(jax.jit(lambda v, a: cbca_hdw(v, a, 1)), vol, arms,
          label="cbca xla (H,D,W) x1")
    timed(jax.jit(lambda v, a: cbca_hdw(v, a, 16)), vol, arms, iters=1,
          label="cbca xla (H,D,W) x16")

    a = np.asarray(jax.jit(lambda v, ar: cbca(v, ar, 2, 14))(vol, arms))
    b = np.asarray(jax.jit(lambda v, ar: cbca_hdw(v, ar, 2))(vol, arms))
    print("layout diff:", float(np.max(np.abs(a - b))), flush=True)


if __name__ == "__main__":
    main()
