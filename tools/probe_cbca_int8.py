"""Quality probe: would int8 cost-volume storage inside CBCA survive?

CBCA is DMA-bound (BASELINE.md: the fused kernel runs at ~92% of its
tiling's measured stream floor, and the floor's achieved bandwidth
self-limits at ~237 GB/s). The only remaining lever that cuts BYTES
rather than traffic pattern is narrower storage: int8 volumes between
CBCA rounds would halve DMA bytes vs bf16. Before any kernel work, this
probe answers the cheap decisive question: does per-round symmetric int8
requantization (one scale per CBCA block, computed from the block's entry
volume — averaging is a convex combination so |avg| <= max|v| and the
entry scale stays valid for every round) cost measurable bad-2.0 at
headline scale with trained weights?

Simulation: the pipeline's ``cbca_fn`` hook replaces the production
aggregation with: quantize entry -> [1 exact XLA round -> requantize] x
iterations. BIG_COST pad lanes are held at BIG (the real kernel would pin
them at q=127, the max cost — same argmin semantics). Three modes per
scene family:

- prod-bf16: the shipped production schedule (context number)
- sim-f32:   the cbca_fn harness WITHOUT quantization (isolates harness
             numerics from the quantization effect)
- sim-int8:  the same harness WITH per-round int8 requantization

Decision rule: |bad-2.0(sim-int8) - bad-2.0(sim-f32)| per family. If the
worst family's delta is well under the 0.5 pt parity budget, the int8
fused kernel is worth building; the perf side is probed separately
(tools/bench_cbca_stream.py DTYPE=i8 — the int8 stream floor).

    python tools/probe_cbca_int8.py [--height 1000 --width 1504]
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

FAMILIES = ("translation", "slanted", "textureless", "occlusion")

BIG_CUTOFF = 1e8  # values above this are BIG_COST pad sentinels


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--width", type=int, default=1504)
    parser.add_argument("--max-disparity", type=int, default=160)
    parser.add_argument("--families", type=str, default=",".join(FAMILIES))
    parser.add_argument("--weights", type=str, default=REFERENCE_CKPT)
    parser.add_argument("--noise", type=float, default=0.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mccnn_tpu.models import init_params
    from mccnn_tpu.models.params import load_any
    from mccnn_tpu.ops.cbca import cbca
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig
    from mccnn_tpu.utils.evaluate import evaluate_pair
    from mccnn_tpu.utils.scenes import scene_pair

    try:
        params = load_any(args.weights)
        weights = os.path.basename(args.weights)
    except Exception as exc:  # TF missing / ckpt unreadable
        params = init_params(jax.random.key(0))
        weights = f"random init ({type(exc).__name__})"
    print(f"weights: {weights}  backend: {jax.default_backend()}", flush=True)

    config = MatchConfig()  # paper defaults
    ndisp = args.max_disparity + 2
    distance = int(config.cbca_distance)

    def make_cbca_fn(quantize: bool):
        def fn(volume, arms, iterations):
            vol = volume.astype(jnp.float32)
            if quantize:
                valid = vol < BIG_CUTOFF
                amax = jnp.max(jnp.abs(jnp.where(valid, vol, 0.0)))
                scale = 126.0 / jnp.maximum(amax, 1e-6)

                def q(v):
                    qv = jnp.clip(jnp.round(v * scale), -127.0, 127.0) / scale
                    return jnp.where(v < BIG_CUTOFF, qv, v)
            else:
                def q(v):
                    return v

            vol = q(vol)
            vol = lax.fori_loop(
                0, iterations, lambda _, v: q(cbca(v, arms, 1, distance)), vol
            )
            return vol.astype(volume.dtype)

        return fn

    runs = {
        "prod-bf16": jax.jit(lambda l, r: match_pair(
            params, l, r, ndisp, config, volume_dtype="bfloat16")),
        "sim-f32": jax.jit(lambda l, r: match_pair(
            params, l, r, ndisp, config, volume_dtype="bfloat16",
            cbca_fn=make_cbca_fn(False))),
        "sim-int8": jax.jit(lambda l, r: match_pair(
            params, l, r, ndisp, config, volume_dtype="bfloat16",
            cbca_fn=make_cbca_fn(True))),
    }

    rows = []
    worst = 0.0
    for i, family in enumerate(args.families.split(",")):
        rng = np.random.default_rng(1000 + i)
        left, right, gt, occluded, scene_ndisp = scene_pair(
            family, rng, args.height, args.width,
            max_disparity=args.max_disparity,
        )
        assert scene_ndisp <= ndisp
        if args.noise:
            left = (left + args.noise * rng.normal(size=left.shape)
                    ).astype(np.float32)
            right = (right + args.noise * rng.normal(size=right.shape)
                     ).astype(np.float32)
        gt_eval = gt.copy()
        gt_eval[occluded] = np.inf
        lj, rj = jnp.asarray(left), jnp.asarray(right)

        fam = {}
        for mode, fn in runs.items():
            start = time.time()
            disp = np.asarray(fn(lj, rj))
            m = evaluate_pair(disp, gt_eval)
            fam[mode] = m
            print(f"{family:>12} {mode:>9}  bad2 {m['bad_2.0']:.4f}  "
                  f"bad1 {m['bad_1.0']:.4f}  avg {m['avg_err']:.3f}  "
                  f"({time.time() - start:.1f}s incl. any compile)",
                  flush=True)
        delta = abs(fam["sim-int8"]["bad_2.0"] - fam["sim-f32"]["bad_2.0"])
        worst = max(worst, delta)
        print(f"{family:>12} int8-vs-f32 |bad2 delta| {delta:.4f}", flush=True)
        rows.append((family, {k: v["bad_2.0"] for k, v in fam.items()},
                     delta))

    print(json.dumps({
        "weights": weights,
        "shape": [args.height, args.width, ndisp],
        "worst_bad2_delta": worst,
        "budget": 0.5,
        "verdict": "int8 viable" if worst < 0.05 else (
            "marginal" if worst < 0.5 else "int8 fails budget"),
        "families": [
            {"family": f, "bad_2.0": b, "int8_delta": d} for f, b, d in rows
        ],
    }))


if __name__ == "__main__":
    main()
