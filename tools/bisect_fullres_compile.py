"""Bisect the full-res pipeline's pathological compile time.

Times jax.jit(...).lower() (trace) and .compile() separately for each
pipeline stage at full-res shapes (2000x3008, ndisp 400, bf16 volumes),
plus reduced variants, to locate which stage the remote compiler chokes on.

Run stage-by-stage (each in a fresh process; compiles are remote and a hung
one must be killable):
    python tools/bisect_fullres_compile.py <stage> [H W NDISP]
stages: cost_volume, cbca_chunked, cbca_one, sgm_h, sgm_v, post, pipeline_nochunk
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _report(name, fn, *args):
    import jax

    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    print(f"{name}: lower {t_lower:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(f"{name}: compile {t_compile:.1f}s", file=sys.stderr, flush=True)


def main() -> None:
    stage = sys.argv[1]
    shape = [int(a) for a in sys.argv[2:5]] or [2000, 3008, 400]
    height, width, ndisp = shape

    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import CrossArms
    from mccnn_tpu.utils.config import MatchConfig

    config = MatchConfig()
    d_pad = -(-ndisp // 128) * 128
    vol = jax.ShapeDtypeStruct((height, width, d_pad), jnp.bfloat16)
    img = jax.ShapeDtypeStruct((height, width), jnp.float32)
    arms = CrossArms(*[jax.ShapeDtypeStruct((height, width), jnp.int32)] * 4)

    if stage == "cost_volume":
        from mccnn_tpu.ops.cost_volume import cost_volume_pair

        feat = jax.ShapeDtypeStruct((height, width, 64), jnp.float32)
        _report(
            "cost_volume(pallas,right,bf16)",
            lambda a, b: cost_volume_pair(a, b, ndisp, method="pallas",
                                          sides="right", dtype=jnp.bfloat16),
            feat, feat,
        )
    elif stage == "cbca_chunked":
        from mccnn_tpu.ops.cbca_fused import cbca_fused
        from jax import lax

        def chunked(volume, a):
            def body(c, v):
                start = c * 128
                block = lax.dynamic_slice_in_dim(v, start, 128, axis=2)
                block = cbca_fused(block, a, 2, 14)
                return lax.dynamic_update_slice_in_dim(v, block, start, axis=2)

            return lax.fori_loop(0, volume.shape[2] // 128, body, volume)

        _report("cbca_fused chunked (2 iters)", chunked, vol, arms)
    elif stage == "cbca_one":
        from mccnn_tpu.ops.cbca_fused import cbca_fused

        _report(
            "cbca_fused unchunked (2 iters)",
            lambda v, a: cbca_fused(v, a, 2, 14), vol, arms,
        )
    elif stage in ("sgm_h", "sgm_v"):
        from mccnn_tpu.ops.sgm import _directional_sweep

        direction = (0, 1) if stage == "sgm_h" else (1, 0)
        _report(
            f"sgm sweep {direction}",
            lambda v, a, b: _directional_sweep(v, a, b, "L", direction,
                                               ndisp, config),
            vol, img, img,
        )
    elif stage in ("lr", "classify", "interp", "subpixel", "median",
                   "bilateral"):
        from mccnn_tpu.ops.filters import bilateral_filter, median_filter
        from mccnn_tpu.ops.lr_check import (classify, interpolate,
                                            lr_consistency_interpolate)
        from mccnn_tpu.ops.subpixel import subpixel_enhance

        disp = jax.ShapeDtypeStruct((height, width), jnp.float32)
        stat = jax.ShapeDtypeStruct((height, width), jnp.int32)
        if stage == "lr":
            _report("lr full", lambda a, b: lr_consistency_interpolate(
                a, b, ndisp), disp, disp)
        elif stage == "classify":
            _report("classify", lambda a, b: classify(a, b, ndisp), disp, disp)
        elif stage == "interp":
            _report("interpolate", interpolate, disp, stat)
        elif stage == "subpixel":
            _report("subpixel", lambda d, v: subpixel_enhance(d, v, ndisp),
                    disp, vol)
        elif stage == "median":
            _report("median", lambda d: median_filter(d, 5, 5), disp)
        else:
            _report("bilateral", lambda i, d: bilateral_filter(
                i, d, 5, 5, 0.0, config.blur_sigma, config.blur_threshold),
                img, disp)
    elif stage == "post":
        from mccnn_tpu.ops.filters import bilateral_filter, median_filter
        from mccnn_tpu.ops.lr_check import lr_consistency_interpolate
        from mccnn_tpu.ops.subpixel import subpixel_enhance

        disp = jax.ShapeDtypeStruct((height, width), jnp.float32)

        def post(dl, dr, v, image):
            d = lr_consistency_interpolate(dl, dr, ndisp)
            d = subpixel_enhance(d, v, ndisp)
            d = median_filter(d, 5, 5)
            return bilateral_filter(image, d, 5, 5, 0.0, config.blur_sigma,
                                    config.blur_threshold)

        _report("postprocess", post, disp, disp, vol, img)
    elif stage in ("pipeline_nochunk", "pipeline_chunk"):
        from mccnn_tpu.models.net import init_params
        from mccnn_tpu.pipeline.match import match_pair

        chunk = 128 if stage == "pipeline_chunk" else 0
        params = init_params(jax.random.key(0))
        _report(
            f"pipeline (bf16, fused, chunk={chunk})",
            lambda p, l, r: match_pair(
                p, l, r, ndisp, config, cbca_impl="fused",
                volume_dtype="bfloat16", cbca_chunk_d=chunk,
            ),
            params, img, img,
        )
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
