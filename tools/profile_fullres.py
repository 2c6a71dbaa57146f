"""Per-stage wall-clock profile of the FULL-RES schedule on the real chip.

The f32 stage profiler (tools/profile_pipeline.py) cannot run at full-res
scale — two f32 (2000, 3072, 512) volumes alone exceed one chip's HBM. This
profiler mirrors what ``bench.py --config full`` actually executes: bf16
volumes, ONE volume live at a time, the fused VMEM-mask CBCA kernel with
``cbca_chunk_d=256``, dim-0 SGM sweeps on the bf16 volume. Run:

    python tools/profile_fullres.py [H W NDISP]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=2, label=""):
    import jax
    import jax.numpy as jnp

    sync = jax.jit(
        lambda t: jnp.sum(jax.tree.leaves(t)[0].astype(jnp.float32))
    )
    out = fn(*args)
    np.asarray(sync(out))  # compile + first run
    del out
    # sync-and-free each iteration: two non-donated full-res outputs alive
    # at once (the usual repeat-then-sync pattern) OOM the chip. The ~31 ms
    # tunnel round-trip per iteration is noise at full-res stage sizes.
    t0 = time.time()
    for i in range(iters):
        out = fn(*args)
        np.asarray(sync(out))
        if i < iters - 1:
            del out
    dt = (time.time() - t0) / iters
    print(f"{label:42s} {dt * 1e3:9.1f} ms", flush=True)
    return out, dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mccnn_tpu.models.net import extract_features, init_params
    from mccnn_tpu.ops.cbca import compute_arms
    from mccnn_tpu.ops.cbca_fused import cbca_fused
    from mccnn_tpu.ops.cost_volume import cost_volume_pair
    from mccnn_tpu.ops.filters import bilateral_filter, median_filter
    from mccnn_tpu.ops.lr_check import lr_consistency_interpolate
    from mccnn_tpu.ops.sgm import _directional_sweep
    from mccnn_tpu.ops.subpixel import subpixel_enhance
    from mccnn_tpu.ops.wta import wta_disparity
    from mccnn_tpu.utils.config import MatchConfig

    shape = [int(a) for a in sys.argv[1:4]] or [2000, 3072, 400]
    height, width, ndisp = shape
    d_pad = -(-ndisp // 128) * 128
    chunk_d = 256  # matches bench.py --config full (n_chunks=2 per call)
    config = MatchConfig()
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    right = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))

    feats_fn = jax.jit(lambda p, a, b: (extract_features(p, a),
                                        extract_features(p, b)))
    (fl, fr), _ = timed(feats_fn, params, left, right, label="features x2")

    # one bf16 volume at a time (the sequential-volume schedule)
    cv_fn = jax.jit(lambda a, b: cost_volume_pair(
        a, b, ndisp, method="pallas", sides="left",
        dtype=jnp.bfloat16))
    vol, _ = timed(cv_fn, fl, fr, label="cost_volume single side (bf16)")
    del fl, fr

    arms_fn = jax.jit(lambda img: compute_arms(
        img, config.cbca_intensity, int(config.cbca_distance)))
    arms, _ = timed(arms_fn, left, label="arms (one image)")

    # fused CBCA, one round, full D in one kernel call. Donated, and still
    # allowed to fail: the kernel's padded in+out copies may exceed HBM at
    # full-res (the pipeline runs the chunked form below).
    try:
        cbca_full_fn = jax.jit(lambda v, a: cbca_fused(v, a, 1),
                               donate_argnums=0)
        sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
        vol = cbca_full_fn(vol, arms)  # compile + run (donation chains)
        np.asarray(sync(vol))
        t0 = time.time()
        for _ in range(2):
            vol = cbca_full_fn(vol, arms)
        np.asarray(sync(vol))
        dt = (time.time() - t0) / 2
        print(f"{'cbca_fused 1 round (full D, donated)':42s} "
              f"{dt * 1e3:9.1f} ms", flush=True)
        print(f"{'  -> cbca total (2x(2+16), full D)':42s} "
              f"{dt * 36 * 1e3:9.1f} ms")
    except Exception as exc:  # noqa: BLE001 — stage OOM is informative
        print(f"cbca_fused full-D stage failed: {type(exc).__name__}: "
              f"{str(exc)[:120]}", flush=True)

    # fused CBCA via the d-chunked loop the pipeline uses. Donate the
    # volume: input + loop carry + output is 3 full volumes otherwise.
    def cbca_chunked(v, a):
        def body(c, val):
            start = c * chunk_d
            block = lax.dynamic_slice_in_dim(val, start, chunk_d, axis=2)
            block = cbca_fused(block, a, 1)
            return lax.dynamic_update_slice_in_dim(val, block, start, axis=2)
        return lax.fori_loop(0, d_pad // chunk_d, body, v)
    chunk_fn = jax.jit(cbca_chunked, donate_argnums=0)
    t0 = time.time()
    vol = chunk_fn(vol, arms)  # compile + run (donated: vol is consumed)
    np.asarray(jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))(vol))
    print(f"{'cbca_fused 1 round (chunked, compile+1)':42s} "
          f"{(time.time() - t0) * 1e3:9.1f} ms", flush=True)
    t0 = time.time()
    for _ in range(2):
        vol = chunk_fn(vol, arms)
    np.asarray(jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))(vol))
    dt = (time.time() - t0) / 2
    print(f"{'cbca_fused 1 round (chunked, donated)':42s} "
          f"{dt * 1e3:9.1f} ms", flush=True)
    print(f"{'  -> cbca total (2x(2+16), chunked)':42s} {dt * 36 * 1e3:9.1f} ms")

    # donated + chained: a second live full-res volume OOMs the chip
    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    def timed_sweep(direction, label, vol):
        fn = jax.jit(lambda v, a, b: _directional_sweep(
            v, a, b, "L", direction, ndisp, config), donate_argnums=0)
        vol = fn(vol, left, right)
        np.asarray(sync(vol))
        t0 = time.time()
        for _ in range(2):
            vol = fn(vol, left, right)
        np.asarray(sync(vol))
        dt = (time.time() - t0) / 2
        print(f"{label:42s} {dt * 1e3:9.1f} ms", flush=True)
        return dt, vol

    dt, vol = timed_sweep((0, 1), "sgm horizontal sweep (bf16, donated)", vol)
    dtv, vol = timed_sweep((1, 0), "sgm vertical sweep (bf16, donated)", vol)
    print(f"{'  -> sgm total (8 sweeps, 2 volumes)':42s} "
          f"{(dt + dtv) * 4 * 1e3:9.1f} ms")

    wta_fn = jax.jit(lambda v: wta_disparity(v))
    disp, _ = timed(wta_fn, vol, label="wta (one volume)")
    del vol

    lr_fn = jax.jit(lambda a, b: lr_consistency_interpolate(a, b, ndisp))
    disp, _ = timed(lr_fn, disp, disp, label="lr_check+interpolate")

    # subpixel needs a volume; its cost is value-independent (one-hot
    # lane reductions), and materializing a random f32 one on device
    # first would OOM — zeros in bf16 directly
    vol2 = jnp.zeros((height, width, d_pad), jnp.bfloat16)
    sp_fn = jax.jit(lambda d, v: subpixel_enhance(d, v, ndisp))
    disp, _ = timed(sp_fn, disp, vol2, label="subpixel")
    del vol2

    med_fn = jax.jit(lambda d: median_filter(d, 5, 5))
    disp, _ = timed(med_fn, disp, label="median 5x5")

    bi_fn = jax.jit(lambda i, d: bilateral_filter(
        i, d, 5, 5, 0.0, config.blur_sigma, config.blur_threshold))
    timed(bi_fn, left, disp, label="bilateral 5x5")


if __name__ == "__main__":
    main()
