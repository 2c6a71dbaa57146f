"""Close the train -> match loop at the reference's production scale.

Runs the reference's FULL training recipe shape (reference:
src/train.py:39-201 — 2000 epochs x one 128-triplet batch per image per
epoch; with the 15-scene synthetic dataset below that is 30k steps, the
same step count as the reference's 15-ish Middlebury training pairs)
through the real product path: scene files on disk -> ``cli/train.py``
(StereoDataset RAM prefetch, the C++ native host sampler, the background
batch prefetcher, periodic checkpoints + val sweeps) -> ``model_epochN``
checkpoint -> ``tools/eval_fullscale.py`` per-family bad-2.0 at headline
scale, self-trained weights vs the reference's shipped model_epoch2000.

Training scenes are the five scene families — four synthetic plus the
``photo`` family's real camera-image texture — with gaussian image noise
(clean synthetic texture is too easy — every feature wins; noise makes
feature quality matter, see tests/test_quality_loop.py). The eval passes
the same noise level so the table answers "do OUR trained features match
at least as well as the shipped ones on this distribution?".

    python tools/train_fullscale.py [--epochs 2000] [--out /tmp/mccnn_train]

Evidence recorded in BASELINE.md / PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = ("translation", "slanted", "textureless", "occlusion", "photo")


def write_scene_files(scene_dir: str, family: str,
                      rng: np.random.Generator, height: int, width: int,
                      max_disparity: int, noise: float) -> None:
    from PIL import Image

    from mccnn_tpu.io.pfm import write_pfm
    from mccnn_tpu.utils.scenes import make_scene

    scene = make_scene(family, rng, height, width, max_disparity)
    os.makedirs(scene_dir, exist_ok=True)
    for name, img in (("im0.png", scene["left"]), ("im1.png", scene["right"])):
        noisy = img + noise * rng.normal(size=img.shape).astype(np.float32)
        u8 = np.clip(noisy * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(u8, mode="L").save(os.path.join(scene_dir, name))
    # Middlebury GT convention: occluded pixels keep their disparity in
    # disp0GT.pfm (the reference's sampler rejects gt > col, not occlusion)
    write_pfm(scene["gt"].astype(np.float32),
              os.path.join(scene_dir, "disp0GT.pfm"))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--scenes", type=int, default=15)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=384)
    parser.add_argument("--max-disparity", type=int, default=40)
    parser.add_argument("--noise", type=float, default=0.25,
                        help="gaussian image noise in [0,1] intensity units")
    parser.add_argument("--out", type=str, default="/tmp/mccnn_train")
    parser.add_argument("--eval-height", type=int, default=1000)
    parser.add_argument("--eval-width", type=int, default=1504)
    parser.add_argument("--skip-train", action="store_true",
                        help="reuse an existing checkpoint in --out")
    args = parser.parse_args()

    data_dir = os.path.join(args.out, "data")
    ckpt_dir = os.path.join(args.out, "ckpt")
    metrics_dir = os.path.join(args.out, "metrics")
    os.makedirs(args.out, exist_ok=True)

    # ---- dataset: N train scenes + 2 val scenes across the families ----
    rng = np.random.default_rng(42)
    train_lines, val_lines = [], []
    for i in range(args.scenes):
        family = FAMILIES[i % len(FAMILIES)]
        scene_dir = os.path.join(data_dir, f"train_{i:02d}_{family}")
        if not args.skip_train:
            write_scene_files(scene_dir, family, rng, args.height,
                              args.width, args.max_disparity, args.noise)
        train_lines.append(os.path.join(scene_dir, "im0.png"))
    for i, family in enumerate(("translation", "occlusion")):
        scene_dir = os.path.join(data_dir, f"val_{i:02d}_{family}")
        if not args.skip_train:
            write_scene_files(scene_dir, family, rng, args.height,
                              args.width, args.max_disparity, args.noise)
        val_lines.append(os.path.join(scene_dir, "im0.png"))
    list_dir = os.path.join(args.out, "lists")
    os.makedirs(list_dir, exist_ok=True)
    with open(os.path.join(list_dir, "train.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(list_dir, "val.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")

    ckpt = os.path.join(ckpt_dir, f"model_epoch{args.epochs}.npz")
    if not args.skip_train:
        t0 = time.time()
        from mccnn_tpu.cli.train import main as train_main

        train_main([
            "--list_dir", list_dir,
            "--tensorboard_dir", metrics_dir,
            "--checkpoint_dir", ckpt_dir,
            "--end_epoch", str(args.epochs),
            "--print_freq", "100",
            "--save_freq", str(max(1, args.epochs // 4)),
            "--val_freq", str(max(1, args.epochs // 8)),
            "--sampler_backend", "auto",
            "--prefetch_batches", "4",
        ])
        steps = args.epochs * args.scenes
        dt = time.time() - t0
        print(f"training: {steps} steps in {dt:.1f}s "
              f"({steps / dt:.0f} steps/s incl. host sampling)", flush=True)

    if not os.path.exists(ckpt):
        print(f"checkpoint missing: {ckpt}", flush=True)
        return 1

    # ---- eval: self-trained vs shipped, per family, headline scale ----
    results = {}
    for label, weights in (("self-trained", ckpt), ("shipped", None)):
        cmd = [sys.executable, os.path.join(REPO, "tools/eval_fullscale.py"),
               "--height", str(args.eval_height),
               "--width", str(args.eval_width),
               "--noise", str(args.noise),
               "--no-exact-crosscheck"]
        if weights:
            cmd += ["--weights", weights]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=3600)
        sys.stderr.write(proc.stderr[-2000:])
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[label] = json.loads(line)
        print(f"--- {label} ---", flush=True)
        print(proc.stdout, flush=True)

    print("\n| family | self-trained bad-2.0 | shipped bad-2.0 |", flush=True)
    print("|---|---|---|", flush=True)
    worse = 0
    for mine, theirs in zip(results["self-trained"]["results"],
                            results["shipped"]["results"]):
        assert mine["family"] == theirs["family"]
        flag = "" if mine["bad_2.0"] <= theirs["bad_2.0"] + 0.005 else "  <-- WORSE"
        worse += bool(flag)
        print(f"| {mine['family']} | {mine['bad_2.0']:.4f} | "
              f"{theirs['bad_2.0']:.4f} |{flag}", flush=True)
    print("SELF-TRAINED >= SHIPPED" if not worse
          else f"{worse} families worse than shipped", flush=True)
    return 0 if not worse else 1


if __name__ == "__main__":
    raise SystemExit(main())
