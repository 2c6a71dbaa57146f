"""Matching CLI — flag-compatible with the reference's match.py.

Reference contract (reference: src/match.py:15-54): a left-image list file,
``--data_dir``/``--save_dir``/``--tag`` output derivation, ``--start/--end``
index slicing for per-image process sharding, all CBCA/SGM/blur
hyperparameters, and Middlebury-v3 artifacts (disp0MCCNN.pfm/.pgm,
timeMCCNN.txt) per scene. The pipeline itself runs as one jitted device
program per shape bucket (see mccnn_tpu.pipeline.match).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from mccnn_tpu.data.dataset import load_grayscale
from mccnn_tpu.io.calib import parse_calib
from mccnn_tpu.io.middlebury import (
    derive_scene_paths,
    ensure_dirs,
    save_disparity_pgm,
    save_time_file,
)
from mccnn_tpu.io.pfm import write_pfm
from mccnn_tpu.models.params import load_any
from mccnn_tpu.pipeline.match import MatchPipeline, standardize_image
from mccnn_tpu.utils.config import MatchConfig
from mccnn_tpu.utils.metrics import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="stereo matching based on trained model and post-processing "
                    "(TPU-native)",
    )
    parser.add_argument("-g", "--gpu", type=str, default="0",
                        help="accepted for reference compatibility; device "
                             "selection is automatic under JAX")
    parser.add_argument("-ps", "--patch_size", type=int, default=11)
    parser.add_argument("--list_file", type=str, required=True)
    parser.add_argument("--resume", type=str, required=True,
                        help="weights: native .npz, reference .npy dict, or "
                             "reference TF checkpoint prefix")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("-t", "--tag", type=str, required=True)
    parser.add_argument("-s", "--start", type=int, required=True)
    parser.add_argument("-e", "--end", type=int, required=True)

    parser.add_argument("--cbca_intensity", type=float, default=0.02)
    parser.add_argument("--cbca_distance", type=float, default=14)
    parser.add_argument("--cbca_num_iterations1", type=float, default=2)
    parser.add_argument("--cbca_num_iterations2", type=float, default=16)
    parser.add_argument("--sgm_P1", type=float, default=2.3)
    parser.add_argument("--sgm_P2", type=float, default=55.9)
    parser.add_argument("--sgm_Q1", type=float, default=4)
    parser.add_argument("--sgm_Q2", type=float, default=8)
    parser.add_argument("--sgm_D", type=float, default=0.08)
    parser.add_argument("--sgm_V", type=float, default=1.5)
    parser.add_argument("--blur_sigma", type=float, default=6)
    parser.add_argument("--blur_threshold", type=float, default=2)
    parser.add_argument("--cbca_joint_regions", action="store_true",
                        help="the paper's disparity-conditioned joint-region "
                             "CBCA (shrinks each support region by the other "
                             "image's regions at the correspondent pixel); "
                             "present but disabled in the reference — "
                             "substantially slower, see ops/cbca_joint.py")
    parser.add_argument("--sgm_paper_mode", action="store_true",
                        help="independent-direction SGM average instead of the "
                             "reference's chained in-place sweeps")
    parser.add_argument("--cost_volume_method", type=str, default="auto",
                        choices=["auto", "pallas", "matmul", "rolldot"])
    parser.add_argument("--cbca_impl", type=str, default="auto",
                        choices=["auto", "mxu", "fused", "fused16", "fused8",
                                 "fused2", "fused2_16", "pallas", "xla",
                                 "rolling", "rolling16"],
                        help="CBCA aggregation backend. 'auto' picks the "
                             "fast MXU path on TPU (bf16 multiplies, ~0.16%% "
                             "mean relative deviation per stage; end-to-end "
                             "bad-2.0 pinned within 0.5 pt); 'fused' is the "
                             "VMEM-mask MXU kernel (no O(H*W*W) masks — "
                             "required for full-res). Use 'xla' or 'pallas' "
                             "for exact-f32, reference-matching output; "
                             "'fused8' is the int8-storage memory mode; "
                             "'fused2'/'fused2_16' and 'rolling'/'rolling16' "
                             "are the measured-slower traffic-reducing "
                             "variants (kept for future MXU/HBM ratios)")
    parser.add_argument("--volume_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="cost-volume storage dtype; bfloat16 halves "
                             "volume HBM (DP/aggregation math stays f32) — "
                             "the full-resolution memory mode, a documented "
                             "numerical deviation")
    parser.add_argument("--cbca_chunk_d", type=int, default=0,
                        help="aggregate the disparity axis in chunks of this "
                             "many lanes (0 = off); with --cbca_impl fused "
                             "and --volume_dtype bfloat16 this bounds peak "
                             "HBM for ~6 MP / ndisp-400 full-res scenes")
    parser.add_argument("--bucket", type=int, default=1,
                        help="pad images (edge-replicated) to multiples of "
                             "this to bound recompilation across scene "
                             "shapes. Values >1 change SGM/CBCA numerics in "
                             "the padded band, so outputs deviate slightly "
                             "from the reference; 1 (default) is strict "
                             "parity, 64 recommended for serving throughput")
    parser.add_argument("--multihost", action="store_true",
                        help="shard scenes across jax processes (strided by "
                             "process_index) inside the --start/--end range")
    parser.add_argument("--stage_times", action="store_true",
                        help="print per-stage wall-clock for every scene "
                             "(the reference prints each pipeline stage, "
                             "src/match.py:126-176). Runs the pipeline as "
                             "stage-isolated programs with a sync per stage "
                             "— slower than the fused program; for "
                             "observability, not throughput")
    return parser


def config_from_args(args) -> MatchConfig:
    return MatchConfig(
        cbca_intensity=args.cbca_intensity,
        cbca_distance=int(args.cbca_distance),
        cbca_num_iterations_1=int(args.cbca_num_iterations1),
        cbca_num_iterations_2=int(args.cbca_num_iterations2),
        sgm_p1=args.sgm_P1,
        sgm_p2=args.sgm_P2,
        sgm_q1=args.sgm_Q1,
        sgm_q2=args.sgm_Q2,
        sgm_d=args.sgm_D,
        sgm_v=args.sgm_V,
        blur_sigma=args.blur_sigma,
        blur_threshold=args.blur_threshold,
        sgm_paper_mode=args.sgm_paper_mode,
        cbca_joint_regions=args.cbca_joint_regions,
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    params = load_any(args.resume)
    pipeline = MatchPipeline(
        params, config,
        cost_volume_method=args.cost_volume_method,
        bucket=args.bucket,
        cbca_impl=args.cbca_impl,
        volume_dtype=args.volume_dtype,
        cbca_chunk_d=args.cbca_chunk_d,
    )
    logger = MetricsLogger(None)

    with open(args.list_file) as f:
        scene_paths = [line.strip() for line in f if line.strip()]

    owned = None
    if args.multihost:
        from mccnn_tpu.parallel.multihost import process_slice

        owned = set(process_slice(len(scene_paths)))

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda x: x  # noqa: E731

    for index, left_path in enumerate(tqdm(scene_paths)):
        if index < args.start or index > args.end:
            continue
        if owned is not None and index not in owned:
            continue
        paths = derive_scene_paths(left_path, args.data_dir, args.save_dir, args.tag)
        ensure_dirs(paths)
        height, width, ndisp = parse_calib(paths.calib)
        logger.log(event="scene", index=index, left=paths.left,
                   height=height, width=width, ndisp=ndisp)

        left_image = standardize_image(load_grayscale(paths.left))
        right_image = standardize_image(load_grayscale(paths.right))
        if left_image.shape != (height, width):
            raise ValueError(
                f"{paths.left}: image shape {left_image.shape} != calib "
                f"({height}, {width})"
            )

        start_time = time.time()
        if args.stage_times:
            disparity, stage_seconds = pipeline.stage_times(
                left_image, right_image, ndisp
            )
            for stage, seconds in stage_seconds.items():
                print(f"  {stage:16s} {seconds * 1e3:9.1f} ms", flush=True)
            logger.log(event="stage_times", index=index,
                       **{k: round(v, 4) for k, v in stage_seconds.items()})
        else:
            disparity = pipeline(left_image, right_image, ndisp)
        elapsed = time.time() - start_time

        save_disparity_pgm(disparity, paths.out_pgm)
        write_pfm(disparity, paths.out_pfm)
        save_time_file(elapsed, paths.out_time)
        logger.log(event="done", index=index, seconds=elapsed,
                   mpix_per_s=height * width / 1e6 / elapsed)


if __name__ == "__main__":
    main()
