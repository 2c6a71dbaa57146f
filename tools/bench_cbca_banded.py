"""Banded-block MXU CBCA experiment vs the dense-mask einsum.

MEASURED (v5e, half-res): dense 28.5 ms/round, banded 68.6 ms/round —
the banded formulation loses despite 4x less mask traffic because the
(384, 128) x (384, 256) batched matmuls underfill the MXU and the three
block-shifted volume views materialize copies. Kept as documentation:
the banded mask STORAGE (4x smaller) still matters for full-res mask
memory (ROADMAP #1), but should be paired with a Pallas kernel that
generates mask blocks in VMEM rather than XLA einsums.
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

    sync = jax.jit(lambda t: jnp.sum(jax.tree.leaves(t)[0]))
    out = fn(*args)
    np.asarray(sync(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(sync(out))
    print(f"{label:44s} {(time.time() - t0) / iters * 1e3:9.1f} ms", flush=True)
    return out


def banded_round(vol, arms, dist=14, block=128):
    """One aggregation round with banded-block masks (3 shifted einsums)."""
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import _arm_stencil_sum

    height, width, d_pad = vol.shape
    wb = -(-width // block)
    hb = -(-height // block)
    wp, hp = wb * block, hb * block

    def pad_plane(p, ph, pw):
        return jnp.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])))

    arm_l = pad_plane(arms.left, hp, wp)
    arm_r = pad_plane(arms.right, hp, wp)
    arm_u = pad_plane(arms.up, hp, wp)
    arm_d = pad_plane(arms.down, hp, wp)

    # banded horizontal masks: M[h, i, s, a, b] = 1 iff src w'=(i+s-1)*B+a
    # is on the horizontal arm of dst w=i*B+b
    a_i = jnp.arange(block, dtype=jnp.int32)
    s_i = jnp.arange(3, dtype=jnp.int32)
    delta = ((s_i[:, None, None] - 1) * block
             + a_i[None, :, None] - a_i[None, None, :])  # (3, a, b)
    l_blk = arm_l.reshape(hp, wb, 1, 1, block).astype(jnp.int32)
    r_blk = arm_r.reshape(hp, wb, 1, 1, block).astype(jnp.int32)
    mh = ((delta[None, None] >= -l_blk) & (delta[None, None] <= r_blk)
          ).astype(jnp.bfloat16)  # (hp, wb, 3, a, b)

    u_t = arm_u.T.reshape(wp, hb, 1, 1, block).astype(jnp.int32)
    d_t = arm_d.T.reshape(wp, hb, 1, 1, block).astype(jnp.int32)
    nv = ((delta[None, None] >= -u_t) & (delta[None, None] <= d_t)
          ).astype(jnp.bfloat16)  # (wp, hb, 3, a, b)

    h_count = (arm_l + arm_r + 1).astype(jnp.float32)
    region = _arm_stencil_sum(h_count, arm_u, arm_d, 0, dist)
    inv_region = (1.0 / region)[..., None]

    volp = jnp.pad(vol, ((0, hp - height), (0, wp - width), (0, 0)))
    v16 = volp.astype(jnp.bfloat16)
    # shifted block views, tile-aligned slices of one padded copy
    vpad = jnp.pad(v16, ((0, 0), (block, block), (0, 0)))
    mid = None
    for s in range(3):
        shifted = vpad[:, s * block: s * block + wp, :].reshape(
            hp, wb, block, d_pad
        )
        term = jnp.einsum("hiab,hiad->hibd", mh[:, :, s], shifted,
                          preferred_element_type=jnp.float32)
        mid = term if mid is None else mid + term
    mid = mid.reshape(hp, wp, d_pad)

    m16 = mid.astype(jnp.bfloat16)
    mpad = jnp.pad(m16, ((block, block), (0, 0), (0, 0)))
    out = None
    for s in range(3):
        shifted = mpad[s * block: s * block + hp].reshape(
            hb, block, wp, d_pad
        )
        term = jnp.einsum("wiab,iawd->ibwd", nv[:, :, s], shifted,
                          preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    out = jnp.transpose(out, (0, 1, 2, 3)).reshape(hp, wp, d_pad)
    out = out * inv_region
    return out[:height, :width]


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cbca_mxu import cbca_mxu

    height, width, d_pad = 1000, 1504, 256
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    vol = jnp.asarray(rng.normal(size=(height, width, d_pad)).astype(np.float32))
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(image)

    timed(jax.jit(lambda v, a: cbca_mxu(v, a, 1, 14)), vol, arms,
          label="dense MXU x1")
    timed(jax.jit(lambda v, a: banded_round(v, a)), vol, arms,
          label="banded-block MXU x1")
    a = np.asarray(jax.jit(lambda v, ar: cbca_mxu(v, ar, 1, 14))(vol, arms))
    b = np.asarray(jax.jit(lambda v, ar: banded_round(v, ar))(vol, arms))
    print("dense vs banded max abs diff:", float(np.max(np.abs(a - b))),
          flush=True)


if __name__ == "__main__":
    main()
