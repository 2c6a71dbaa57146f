"""Long-lived serving process: warm up shape buckets, then serve scenes.

The platform's cold-start problem (BASELINE.md "Serving"): no persistent
compile cache exists under this TPU plugin, so a fresh process pays a
90-525 s remote compile per shape bucket, while the steady state is ~1.1 s
per half-res pair. The serving answer is process reuse: ONE process that
precompiles every shape bucket it will see (tools/warmup.py logic), then
serves scene after scene at steady-state latency.

Protocol: newline-delimited requests on stdin, one JSON result per line on
stdout (logs go to stderr). Each request is

    <scene_dir> <out_dir>

where ``scene_dir`` holds the Middlebury-layout ``im0.png im1.png
calib.txt`` and ``out_dir`` receives ``disp0MCCNN.pfm`` / ``disp0MCCNN.pgm``
/ ``timeMCCNN.txt`` (the reference's artifact contract, reference:
src/match.py:52-54). An empty line or EOF shuts the server down. The
response line reports cold/warm status and latency:

    {"scene": ..., "seconds": 1.12, "warm": true, "ok": true}

Response ordering: results are emitted in request order. When requests are
PIPELINED (several lines in flight), scene N's response may be emitted just
after scene N+1 is dispatched — that is the double-buffering that overlaps
host I/O with device compute. A SYNCHRONOUS client (waits for each response
before sending the next request) is also safe: whenever no further request
is immediately readable, the server finalizes the in-flight scene and emits
its response before blocking on stdin, so each response arrives as soon as
the device finishes — never held hostage to the next request.

Usage:

    python -m mccnn_tpu.cli.serve --resume weights.npz \
        [--warmup_list scenes.txt] [--warmup_shapes HxWxD,...] [--bucket 64]

``--warmup_list`` warms every bucket appearing in a scene list;
``--warmup_shapes`` warms explicit ``HxWxNDISP`` triples. Requests whose
bucket was not warmed still work — they just pay their compile on first
touch (reported with "warm": false).
"""

from __future__ import annotations

import argparse
import json
import os
import select
import sys
import time

import numpy as np


class _RequestReader:
    """Line reader that reports whether a request is immediately available.

    Reads raw bytes from the stream's fd when it has one (real pipes/ttys),
    so Python-level readline buffering can never hide pending lines from
    ``select`` — a pipelined batch client keeps full host/device overlap.
    Falls back to the stream's own ``readline`` for fd-less streams (tests
    pass ``io.StringIO``), which never block anyway.
    """

    def __init__(self, stream):
        self._stream = stream
        self._buf = b""
        self._eof = False
        try:
            self._fd = stream.fileno()
        except Exception:  # noqa: BLE001 — StringIO raises UnsupportedOperation
            self._fd = None

    def poll(self) -> bool:
        """True if ``readline`` would return without blocking."""
        if self._fd is None:
            return True  # in-memory streams never block
        while b"\n" not in self._buf and not self._eof:
            if not select.select([self._fd], [], [], 0)[0]:
                return False
            chunk = os.read(self._fd, 65536)
            if not chunk:
                self._eof = True
            self._buf += chunk
        return True

    def readline(self):
        """Next line without its newline, or ``None`` at EOF (blocking)."""
        if self._fd is None:
            line = self._stream.readline()
            return None if line == "" else line.rstrip("\n")
        while b"\n" not in self._buf and not self._eof:
            chunk = os.read(self._fd, 65536)
            if not chunk:
                self._eof = True
            self._buf += chunk
        if b"\n" in self._buf:
            raw, self._buf = self._buf.split(b"\n", 1)
        elif self._buf:
            raw, self._buf = self._buf, b""
        else:
            return None
        return raw.decode("utf-8", "replace")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="long-lived stereo matching server (warmup + serve loop)",
    )
    parser.add_argument("--resume", type=str, required=True,
                        help="weights: native .npz, reference .npy dict, or "
                             "reference TF checkpoint prefix")
    parser.add_argument("--warmup_list", type=str, default=None,
                        help="left-image list; warms each scene's shape bucket")
    parser.add_argument("--warmup_shapes", type=str, default=None,
                        help="comma-separated HxWxNDISP triples to warm")
    parser.add_argument("--bucket", type=int, default=64,
                        help="pad images to multiples of this (fewer programs;"
                             " see the match CLI help for the parity note)")
    parser.add_argument("--cost_volume_method", type=str, default="auto")
    parser.add_argument("--cbca_impl", type=str, default="auto")
    parser.add_argument("--volume_dtype", type=str, default="float32")
    parser.add_argument("--cbca_chunk_d", type=int, default=0)
    return parser


def main(argv=None, stdin=None, stdout=None) -> None:
    args = build_parser().parse_args(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout

    from mccnn_tpu.data.dataset import load_grayscale
    from mccnn_tpu.io.calib import parse_calib
    from mccnn_tpu.io.middlebury import save_disparity_pgm, save_time_file
    from mccnn_tpu.io.pfm import write_pfm
    from mccnn_tpu.models.params import load_any
    from mccnn_tpu.pipeline.match import MatchPipeline, standardize_image

    params = load_any(args.resume)
    pipeline = MatchPipeline(
        params,
        cost_volume_method=args.cost_volume_method,
        bucket=args.bucket,
        cbca_impl=args.cbca_impl,
        volume_dtype=args.volume_dtype,
        cbca_chunk_d=args.cbca_chunk_d,
    )

    def bucket_of(height: int, width: int, ndisp: int):
        return (pipeline._bucketed(height), pipeline._bucketed(width), ndisp)

    # ---- warmup phase: compile every announced shape bucket up front ----
    shapes = {}
    if args.warmup_list:
        with open(args.warmup_list) as f:
            for line in f:
                left_path = line.strip()
                if not left_path:
                    continue
                calib = os.path.join(os.path.dirname(left_path), "calib.txt")
                height, width, ndisp = parse_calib(calib)
                shapes[bucket_of(height, width, ndisp)] = (height, width, ndisp)
    if args.warmup_shapes:
        for triple in args.warmup_shapes.split(","):
            height, width, ndisp = (int(v) for v in triple.lower().split("x"))
            shapes[bucket_of(height, width, ndisp)] = (height, width, ndisp)

    warmed = set()
    for bucketed, (height, width, ndisp) in sorted(shapes.items()):
        zeros = np.zeros((height, width), dtype=np.float32)
        t0 = time.time()
        pipeline(zeros, zeros, ndisp)
        warmed.add(bucketed)
        print(f"warmed {bucketed}: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    print(json.dumps({"event": "ready", "warmed": len(warmed)}),
          file=stdout, flush=True)

    # ---- serve loop: newline requests until EOF/blank line ----
    # Double-buffered: scene N is DISPATCHED (device enqueue, no sync),
    # then scene N-1 is finalized (result fetch + artifact writes) while
    # N's device program runs; the next iteration's image load/decode also
    # overlaps it. Responses stay in request order (the pending scene is
    # always finalized before any newer response is emitted).
    pending = None  # (scene_dir, out_dir, t0, warm, height, width, handle)
    served = [0, 0.0]  # scenes finalized, wall seconds of serve phase
    t_serve0 = time.time()

    def finalize():
        nonlocal pending
        if pending is None:
            return
        scene_dir, out_dir, t0, warm, height, width, handle = pending
        pending = None
        try:
            disparity = pipeline.fetch(handle)
            elapsed = time.time() - t0
            os.makedirs(out_dir, exist_ok=True)
            write_pfm(disparity, os.path.join(out_dir, "disp0MCCNN.pfm"))
            save_disparity_pgm(
                disparity, os.path.join(out_dir, "disp0MCCNN.pgm")
            )
            save_time_file(elapsed, os.path.join(out_dir, "timeMCCNN.txt"))
            served[0] += 1
            print(json.dumps({
                "scene": scene_dir,
                "seconds": round(elapsed, 4),
                "mpix_per_s": round(height * width / 1e6 / elapsed, 4),
                # completion timestamp relative to serve-loop start:
                # differences between consecutive scenes are the true
                # overlapped throughput (per-scene `seconds` spans host
                # work for neighboring scenes by design)
                "t": round(time.time() - t_serve0, 4),
                "warm": warm,
                "ok": True,
            }), file=stdout, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"scene": scene_dir, "ok": False,
                              "error": str(exc)[:300]}),
                  file=stdout, flush=True)

    reader = _RequestReader(stdin)
    while True:
        if pending is not None and not reader.poll():
            # No request is immediately readable: finalize the in-flight
            # scene NOW rather than while blocked on stdin — a synchronous
            # client is waiting for this response before it will send the
            # next request (deadlock otherwise), and the per-scene clock
            # (timeMCCNN.txt) must not absorb stdin idle time.
            finalize()
        line = reader.readline()
        if line is None:
            break
        line = line.strip()
        if not line:
            break
        try:
            scene_dir, out_dir = line.split()
            left_path = os.path.join(scene_dir, "im0.png")
            right_path = os.path.join(scene_dir, "im1.png")
            height, width, ndisp = parse_calib(
                os.path.join(scene_dir, "calib.txt")
            )
            warm = bucket_of(height, width, ndisp) in warmed
            left = standardize_image(load_grayscale(left_path))
            right = standardize_image(load_grayscale(right_path))
            t0 = time.time()
            handle = pipeline.dispatch(left, right, ndisp)
            warmed.add(bucket_of(height, width, ndisp))
            nxt = (scene_dir, out_dir, t0, warm, height, width, handle)
        except Exception as exc:  # noqa: BLE001 — a bad scene must not
            # kill the server (crash-and-rerun granularity stays one scene,
            # like the reference's --start/--end contract); finalize the
            # pending scene first so responses stay in request order
            finalize()
            print(json.dumps({"scene": line, "ok": False,
                              "error": str(exc)[:300]}),
                  file=stdout, flush=True)
            continue
        finalize()  # overlaps the freshly-dispatched scene's device run
        pending = nxt
    finalize()
    if served[0]:
        served[1] = time.time() - t_serve0
        print(f"served {served[0]} scenes in {served[1]:.2f}s "
              f"({served[0] / served[1]:.2f} pairs/s)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
