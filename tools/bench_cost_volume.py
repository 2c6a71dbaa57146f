"""Micro-benchmarks for cost-volume construction strategies on TPU."""

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
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    height, width, d_pad = 1000, 1504, 256
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(height, width, 64)).astype(np.float32))
    chunk = 8
    nchunks = height // chunk
    flc = fl.reshape(nchunks, chunk, width, 64)
    frc = fr.reshape(nchunks, chunk, width, 64)

    wgrid = jnp.arange(width, dtype=jnp.int32)[:, None]
    dgrid = jnp.arange(d_pad, dtype=jnp.int32)[None, :]
    band_idx = jnp.clip(wgrid - dgrid, 0, width - 1)

    def with_gather(a, b):
        def body(c):
            x, y = c
            corr = jnp.einsum("hwc,hvc->hwv", x, y,
                              precision=lax.Precision.HIGHEST)
            return jnp.take_along_axis(corr, band_idx[None], axis=2)
        return lax.map(body, (a, b))

    timed(jax.jit(with_gather), flc, frc, label="corr + take_along_axis band")

    def skew_band(corr):
        """corr (hc, W, W) -> band (hc, W, D): band[i, w, d] = corr[i, w, w-d].

        Left-pad the correlation rows by D, then re-stride via flatten +
        pad + reshape so row w of the result is corr row w shifted by w
        (the skew); the band is then a static slice + flip.
        """
        hc = corr.shape[0]
        wm = width + d_pad  # left-padded row length
        padded = jnp.pad(corr, ((0, 0), (0, 0), (d_pad, 0)))
        flat = padded.reshape(hc, width * wm)
        flat = jnp.pad(flat, ((0, 0), (0, width * 2)))
        skewed = flat[:, : width * (wm + 1)].reshape(hc, width, wm + 1)
        return jnp.flip(skewed[:, :, 1: d_pad + 1], axis=2)

    def with_skew(a, b):
        def body(c):
            x, y = c
            corr = jnp.einsum("hwc,hvc->hwv", x, y,
                              precision=lax.Precision.HIGHEST)
            return skew_band(corr)
        return lax.map(body, (a, b))

    out_skew = timed(jax.jit(with_skew), flc, frc, label="corr + skew-reshape band")
    out_gather = jax.jit(with_gather)(flc, frc)
    a = np.asarray(out_skew).reshape(height, width, d_pad)
    b = np.asarray(out_gather).reshape(height, width, d_pad)
    # only w >= d entries are meaningful (gather clips, skew wraps)
    mask = np.arange(width)[:, None] >= np.arange(d_pad)[None, :]
    diff = np.abs(a - b)[:, mask]
    print(f"skew vs gather max diff (valid band): {diff.max():.2e}", flush=True)

    from mccnn_tpu.ops.cost_volume import _left_scores_rolldot

    timed(
        jax.jit(lambda a, b: _left_scores_rolldot(a, b, d_pad)),
        fl, fr, iters=1, label="rolldot scan",
    )

    from mccnn_tpu.ops.cost_volume import _border_fill_left, _right_from_left

    scores = jnp.asarray(rng.normal(size=(height, width, d_pad)).astype(np.float32))
    timed(jax.jit(lambda s: _border_fill_left(s, 200)), scores,
          label="border fill left")
    timed(jax.jit(lambda s: _right_from_left(s, 200)), scores,
          label="right volume from left (gather)")


if __name__ == "__main__":
    main()
