"""Per-stage wall-clock profile of the matching pipeline on the real chip.

Times each stage as its own jitted program with a scalar-reduction sync
(block_until_ready is a no-op on tunneled platforms). Run:
    python tools/profile_pipeline.py [H W NDISP]
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
    np.asarray(sync(out))  # compile + first run
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(sync(out))
    dt = (time.time() - t0) / iters
    print(f"{label:34s} {dt * 1e3:9.1f} ms")
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import extract_features, init_params
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cost_volume import cost_volume_pair
    from mccnn_tpu.ops.filters import bilateral_filter, median_filter
    from mccnn_tpu.ops.lr_check import lr_consistency_interpolate
    from mccnn_tpu.ops.sgm import _directional_sweep, sgm
    from mccnn_tpu.ops.subpixel import subpixel_enhance
    from mccnn_tpu.ops.wta import wta_disparity
    from mccnn_tpu.utils.config import MatchConfig

    shape = [int(a) for a in sys.argv[1:4]] or [1000, 1504, 200]
    height, width, ndisp = shape
    config = MatchConfig()
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    right = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))

    total = 0.0
    feats_fn = jax.jit(lambda p, a, b: (extract_features(p, a),
                                        extract_features(p, b)))
    (fl, fr), dt = timed(feats_fn, params, left, right, label="features x2")
    total += dt

    method = "pallas" if jax.default_backend() == "tpu" else "matmul"
    cv_fn = jax.jit(lambda a, b: cost_volume_pair(a, b, ndisp, method=method))
    (lcv, rcv), dt = timed(cv_fn, fl, fr, label=f"cost_volume_pair ({method})")
    total += dt

    arms_fn = jax.jit(
        lambda img: compute_arms(img, config.cbca_intensity,
                                 int(config.cbca_distance))
    )
    (arms_l), dt = timed(arms_fn, left, label="arms (one image)")
    arms_r = arms_fn(right)
    total += 2 * dt

    impl = os.environ.get("CBCA_IMPL", "fused16")
    if jax.default_backend() != "tpu":
        impl = "xla"
    if impl == "mxu":
        from mccnn_tpu.ops.cbca_mxu import cbca_mxu as agg
    elif impl == "fused":
        from mccnn_tpu.ops.cbca_fused import cbca_fused as agg
    elif impl == "fused16":
        import functools

        from mccnn_tpu.ops.cbca_fused import cbca_fused

        agg = functools.partial(cbca_fused, compute_dtype=jnp.bfloat16)
    else:
        agg = cbca
    cbca1_fn = jax.jit(lambda v, a: agg(v, a, 1))
    _, dt = timed(cbca1_fn, lcv, arms_l, label="cbca x1 iter (one volume)")
    total += dt * 2 * (config.cbca_num_iterations_1 + config.cbca_num_iterations_2)
    print(f"{'  -> cbca total (2x(2+16) iters)':34s} "
          f"{dt * 2 * 18 * 1e3:9.1f} ms")

    sweep_fn = jax.jit(
        lambda v, a, b: _directional_sweep(v, a, b, "L", (0, 1), ndisp, config)
    )
    _, dt = timed(sweep_fn, lcv, left, right, label="sgm horizontal sweep")
    total += 4 * dt
    sweep_v_fn = jax.jit(
        lambda v, a, b: _directional_sweep(v, a, b, "L", (1, 0), ndisp, config)
    )
    _, dt = timed(sweep_v_fn, lcv, left, right, label="sgm vertical sweep")
    total += 4 * dt

    wta_fn = jax.jit(lambda v: (wta_disparity(v), wta_disparity(v)))
    (dl, dr), dt = timed(wta_fn, lcv, label="wta x2")
    total += dt

    lr_fn = jax.jit(lambda a, b: lr_consistency_interpolate(a, b, ndisp))
    disp, dt = timed(lr_fn, dl, dr, label="lr_check+interpolate")
    total += dt

    sp_fn = jax.jit(lambda d, v: subpixel_enhance(d, v, ndisp))
    disp, dt = timed(sp_fn, disp, lcv, label="subpixel")
    total += dt

    med_fn = jax.jit(lambda d: median_filter(d, 5, 5))
    disp, dt = timed(med_fn, disp, label="median 5x5")
    total += dt

    bi_fn = jax.jit(lambda i, d: bilateral_filter(i, d, 5, 5, 0.0,
                                                  config.blur_sigma,
                                                  config.blur_threshold))
    _, dt = timed(bi_fn, left, disp, label="bilateral 5x5")
    total += dt

    print(f"{'SUM (approx, stage-isolated)':34s} {total * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
