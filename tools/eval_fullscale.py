"""Headline-scale quality evaluation on the real TPU.

All parity evidence elsewhere runs at small-crop scale (where the
reference's Python loops / the NumPy oracle chain are feasible). This tool
evaluates ABSOLUTE matching quality at half-res Middlebury scale
(1000x1504) on the real chip: the five scene families
(``utils/scenes.py`` — translation, slanted plane, textureless patches,
occlusion geometry, and real-photograph texture) have exact known
disparity, so bad-N / avg-err are exact even though no Middlebury data
ships in this environment. Occluded
pixels are excluded (Middlebury "nonocc" convention).

Runs the production half-res schedule (bf16 volumes + fused CBCA — the
bench configuration) AND, for the first family, the exact-f32 XLA path as
a cross-check that the fast schedule's quality matches at scale.

Weights: the reference's shipped trained checkpoint
(/root/reference/data/tensorboard_log/model_epoch2000.ckpt, loaded via
models/params.load_any) when TF is importable, else random init (noted in
the output — feature quality then limits absolute numbers, but the
fast-vs-exact delta remains meaningful).

    python tools/eval_fullscale.py [--height 1000 --width 1504]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CKPT = "/root/reference/data/tensorboard_log/model_epoch2000.ckpt"

FAMILIES = ("translation", "slanted", "textureless", "occlusion", "photo")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--width", type=int, default=1504)
    parser.add_argument("--max-disparity", type=int, default=160)
    parser.add_argument("--families", type=str, default=",".join(FAMILIES))
    parser.add_argument("--weights", type=str, default=REFERENCE_CKPT,
                        help="any load_any-supported weights (default: the "
                        "reference's shipped model_epoch2000 checkpoint); "
                        "tools/train_fullscale.py points this at its own "
                        "trained .npz for the self-trained-vs-shipped table")
    parser.add_argument("--no-exact-crosscheck", action="store_true")
    parser.add_argument("--noise", type=float, default=0.0,
                        help="gaussian image noise added to the eval scenes "
                        "(matching train_fullscale's training distribution)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models import init_params
    from mccnn_tpu.models.params import load_any
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig
    from mccnn_tpu.utils.evaluate import evaluate_pair
    from mccnn_tpu.utils.scenes import scene_pair

    try:
        params = load_any(args.weights)
        weights = ("reference model_epoch2000"
                   if args.weights == REFERENCE_CKPT else args.weights)
    except Exception as exc:  # TF missing / ckpt unreadable
        params = init_params(jax.random.key(0))
        weights = f"random init ({type(exc).__name__})"
    print(f"weights: {weights}", flush=True)
    print(f"backend: {jax.default_backend()}", flush=True)

    config = MatchConfig()  # paper defaults
    # every family uses the same padded ndisp bucket -> ONE compile
    ndisp = args.max_disparity + 2

    def run_fast(l, r):
        return match_pair(params, l, r, ndisp, config,
                          volume_dtype="bfloat16")

    def run_exact(l, r):
        return match_pair(params, l, r, ndisp, config, cbca_impl="xla",
                          cost_volume_method="matmul")

    fast = jax.jit(run_fast)
    exact = jax.jit(run_exact)

    rows = []
    for i, family in enumerate(args.families.split(",")):
        rng = np.random.default_rng(1000 + i)
        left, right, gt, occluded, scene_ndisp = scene_pair(
            family, rng, args.height, args.width,
            max_disparity=args.max_disparity,
        )
        assert scene_ndisp <= ndisp, (scene_ndisp, ndisp)
        if args.noise:
            left = (left + args.noise * rng.normal(size=left.shape)
                    ).astype(np.float32)
            right = (right + args.noise * rng.normal(size=right.shape)
                     ).astype(np.float32)
        gt_eval = gt.copy()
        gt_eval[occluded] = np.inf
        lj, rj = jnp.asarray(left), jnp.asarray(right)

        start = time.time()
        disp = np.asarray(fast(lj, rj))
        elapsed = time.time() - start
        m = evaluate_pair(disp, gt_eval)
        rows.append((family, "fast-bf16", m, elapsed))
        print(f"{family:>12} fast-bf16  bad2 {m['bad_2.0']:.4f}  "
              f"bad1 {m['bad_1.0']:.4f}  avg {m['avg_err']:.3f}  "
              f"({elapsed:.1f}s incl. any compile)", flush=True)

        if i == 0 and not args.no_exact_crosscheck:
            start = time.time()
            dexact = np.asarray(exact(lj, rj))
            elapsed = time.time() - start
            me = evaluate_pair(dexact, gt_eval)
            rows.append((family, "exact-f32", me, elapsed))
            delta = abs(me["bad_2.0"] - m["bad_2.0"])
            print(f"{family:>12} exact-f32  bad2 {me['bad_2.0']:.4f}  "
                  f"bad1 {me['bad_1.0']:.4f}  avg {me['avg_err']:.3f}  "
                  f"({elapsed:.1f}s)  |bad2 delta| {delta:.4f}", flush=True)

    print(json.dumps({
        "weights": weights,
        "shape": [args.height, args.width, ndisp],
        "results": [
            {"family": f, "mode": mode, "bad_2.0": m["bad_2.0"],
             "bad_1.0": m["bad_1.0"], "avg_err": m["avg_err"]}
            for f, mode, m, _ in rows
        ],
    }))


if __name__ == "__main__":
    main()
