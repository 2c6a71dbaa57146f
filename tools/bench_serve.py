"""Measure serving throughput through the REAL serve loop on the TPU.

Generates synthetic half-res-scale Middlebury-layout scenes on disk, then
drives ``mccnn_tpu.cli.serve`` in-process: warmup compiles the shape
bucket, the serve loop then streams the scenes through the double-buffered
dispatch/finalize path (scene N's device program overlaps scene N-1's
artifact writes and scene N+1's image decode). Reports per-scene latency
and steady-state pairs/s (the devices-idle ceiling is the bench.py pair
time).

    python tools/bench_serve.py [--scenes 8] [--height 1000 --width 1504]

``--client pipelined`` (default) streams every request up front;
``--client sync`` waits for each scene's response before sending the next
request — the mode that used to deadlock before the poll-based finalize
(cli/serve.py::_RequestReader) and now measures pure request/response
latency. Both pipe modes use REAL OS pipes (the fd/select path production
stdin takes); ``--client stringio`` keeps the legacy in-memory drive.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = ("translation", "slanted", "textureless", "occlusion")


def _drive_over_pipes(serve_main, serve_args, requests, sync: bool):
    """Run the server on real OS pipes (the production fd/select path).

    ``sync=False``: write every request up front (kernel pipe buffer holds
    them; the server's poll() sees data and keeps full overlap).
    ``sync=True``: wait for each scene's response line before sending the
    next request — deadlocks on servers that hold scene N's response until
    request N+1 arrives.
    """
    import threading

    req_r, req_w = os.pipe()
    res_r, res_w = os.pipe()
    server = threading.Thread(
        target=serve_main,
        args=(serve_args,),
        kwargs={"stdin": os.fdopen(req_r, "r"), "stdout": os.fdopen(res_w, "w")},
        daemon=True,
    )
    server.start()
    writer = os.fdopen(req_w, "w")
    lines, buf = [], b""

    def next_line():
        nonlocal buf
        while b"\n" not in buf:
            chunk = os.read(res_r, 65536)
            if not chunk:
                return None
            buf += chunk
        raw, buf = buf.split(b"\n", 1)
        lines.append(raw.decode())
        return lines[-1]

    next_line()  # ready event (after warmup)
    if sync:
        for request in requests:
            writer.write(request)
            writer.flush()
            next_line()
        writer.close()
    else:
        writer.write("".join(requests))
        writer.flush()
        writer.close()
        for _ in requests:
            next_line()
    server.join(timeout=120)
    os.close(res_r)
    return lines


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", type=int, default=8)
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--width", type=int, default=1504)
    parser.add_argument("--ndisp", type=int, default=200)
    parser.add_argument("--root", type=str, default="/tmp/mccnn_serve_bench")
    parser.add_argument("--volume_dtype", type=str, default="bfloat16")
    parser.add_argument("--client", type=str, default="pipelined",
                        choices=["pipelined", "sync", "stringio"],
                        help="pipelined: all requests up front over a real "
                             "pipe; sync: wait for each response before the "
                             "next request; stringio: legacy in-memory drive")
    args = parser.parse_args()

    from PIL import Image

    from mccnn_tpu.models import init_params, save_params
    from mccnn_tpu.utils.scenes import make_scene

    shutil.rmtree(args.root, ignore_errors=True)
    data = os.path.join(args.root, "data")
    out = os.path.join(args.root, "out")
    requests = []
    rng = np.random.default_rng(7)
    for i in range(args.scenes):
        family = FAMILIES[i % len(FAMILIES)]
        scene_dir = os.path.join(data, f"s{i:02d}")
        os.makedirs(scene_dir, exist_ok=True)
        scene = make_scene(family, rng, args.height, args.width,
                           max_disparity=args.ndisp - 40)
        for name, img in (("im0.png", scene["left"]),
                          ("im1.png", scene["right"])):
            u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(u8, mode="L").save(os.path.join(scene_dir, name))
        with open(os.path.join(scene_dir, "calib.txt"), "w") as f:
            f.write("cam0=[1 0 0]\ncam1=[1 0 0]\ndoffs=0\nbaseline=100\n"
                    f"width={args.width}\nheight={args.height}\n"
                    f"ndisp={args.ndisp}\n")
        requests.append(f"{scene_dir} {os.path.join(out, f's{i:02d}')}\n")

    import jax

    weights = os.path.join(args.root, "weights.npz")
    save_params(init_params(jax.random.key(0)), weights)

    from mccnn_tpu.cli.serve import main as serve_main

    serve_args = ["--resume", weights, "--bucket", "64",
                  "--volume_dtype", args.volume_dtype,
                  "--warmup_shapes", f"{args.height}x{args.width}x{args.ndisp}"]
    t0 = time.time()
    if args.client == "stringio":
        stdout = io.StringIO()
        serve_main(serve_args, stdin=io.StringIO("".join(requests)),
                   stdout=stdout)
        lines = stdout.getvalue().splitlines()
    else:
        lines = _drive_over_pipes(serve_main, serve_args, requests,
                                  sync=args.client == "sync")
    total = time.time() - t0
    responses = [json.loads(line) for line in lines]
    ready = responses[0]
    assert ready["event"] == "ready" and ready["warmed"] == 1, ready
    scenes = responses[1:]
    ok = [r for r in scenes if r.get("ok")]
    lat = [r["seconds"] for r in ok]
    print(f"served {len(ok)}/{len(scenes)} ok; per-scene latency "
          f"min {min(lat):.3f}s median {sorted(lat)[len(lat)//2]:.3f}s "
          f"max {max(lat):.3f}s", flush=True)
    # steady state: completion-to-completion wall clock, dropping the
    # first scene (pipeline fill / residual warm effects)
    steady = len(ok) - 1
    t_steady = ok[-1]["t"] - ok[0]["t"]
    print(json.dumps({
        "metric": "serve_throughput_pairs_per_s",
        "value": round(steady / t_steady, 3),
        "unit": "pairs/s",
        "scenes": len(ok),
        "bucket": [args.height, args.width, args.ndisp],
        "volume_dtype": args.volume_dtype,
        "total_wall_s": round(total, 1),
    }), flush=True)
    return 0 if len(ok) == len(scenes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
