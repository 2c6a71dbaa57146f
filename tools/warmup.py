"""Precompile the matching pipeline for a scene list's shape buckets.

Cold-start mitigation (BASELINE.md "serving" note): under this TPU plugin
the JAX persistent compilation cache writes nothing, so every new process
pays the full remote compile (~4 min for the half-res program). A serving
process should therefore warm up BEFORE taking traffic:

    python tools/warmup.py --list_file scenes.txt [--bucket 64]
        [--resume weights] [--cbca_impl auto] [--volume_dtype float32]

reads each scene's calib.txt, collects the set of (bucketed H, bucketed W,
ndisp) shapes, and compiles + runs the pipeline once per unique shape on
zero images. Compilation is shape-keyed, so real traffic with the same
buckets then runs at steady-state latency from the first request. Larger
--bucket values collapse more scenes onto fewer programs (fewer compiles,
slight numerical deviation in the padded band — see the match CLI help).

Weights only affect values, not compilation; omitting --resume warms with
random-initialized weights, which is sufficient for precompilation.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--list_file", type=str, required=True,
                        help="left-image list; calib.txt next to each image")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--bucket", type=int, default=64)
    parser.add_argument("--cost_volume_method", type=str, default="auto")
    parser.add_argument("--cbca_impl", type=str, default="auto")
    parser.add_argument("--volume_dtype", type=str, default="float32")
    parser.add_argument("--cbca_chunk_d", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.models.params import load_any
    from mccnn_tpu.io.calib import parse_calib
    from mccnn_tpu.pipeline.match import MatchPipeline

    if args.resume:
        params = load_any(args.resume)
    else:
        params = init_params(jax.random.key(0))

    pipeline = MatchPipeline(
        params,
        cost_volume_method=args.cost_volume_method,
        bucket=args.bucket,
        cbca_impl=args.cbca_impl,
        volume_dtype=args.volume_dtype,
        cbca_chunk_d=args.cbca_chunk_d,
    )

    with open(args.list_file) as f:
        scene_paths = [line.strip() for line in f if line.strip()]

    shapes = {}
    for left_path in scene_paths:
        calib = os.path.join(os.path.dirname(left_path), "calib.txt")
        height, width, ndisp = parse_calib(calib)
        shapes.setdefault((height, width, ndisp), left_path)

    print(f"{len(scene_paths)} scenes -> {len(shapes)} raw shapes",
          flush=True)
    compiled = set()
    for (height, width, ndisp), path in sorted(shapes.items()):
        bucketed = (pipeline._bucketed(height), pipeline._bucketed(width),
                    ndisp)
        if bucketed in compiled:
            continue
        compiled.add(bucketed)
        zeros = np.zeros((height, width), dtype=np.float32)
        t0 = time.time()
        pipeline(zeros, zeros, ndisp)
        print(f"warmed {bucketed} ({path}): {time.time() - t0:.1f}s",
              flush=True)
    print(f"warmup complete: {len(compiled)} programs", flush=True)


if __name__ == "__main__":
    main()
