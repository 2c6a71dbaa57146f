"""Artifact-capture every bench config into one checked-in JSONL log.

bench.py prints exactly one JSON line per config; the driver only ever
captures the default (half-res) config, so full-res / quarter / train
numbers used to live as prose in BASELINE.md. This tool runs each config
in its own fresh process (clean compile state, full HBM) and appends the
JSON lines — plus host/config metadata — to ``BENCH_full.jsonl`` next to
BASELINE.md, so every headline number is a checked-in artifact.

    python tools/bench_all.py [--configs half,quarter,full,train]
                              [--out BENCH_full.jsonl]

Each config can take minutes of remote compile on a cold process; the
whole sweep is ~20-30 min.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_CONFIGS = ("half", "halfexact", "quarter", "full", "train")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", type=str, default=",".join(DEFAULT_CONFIGS))
    parser.add_argument("--out", type=str,
                        default=os.path.join(REPO, "BENCH_full.jsonl"))
    parser.add_argument("--timeout", type=int, default=3600,
                        help="per-config timeout (seconds)")
    args = parser.parse_args()

    failures = 0
    with open(args.out, "a") as log:
        for config in args.configs.split(","):
            t0 = time.time()
            print(f"=== bench --config {config} ===", flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--config", config],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO,
            )
            sys.stderr.write(proc.stderr[-4000:])
            line = None
            for out_line in proc.stdout.splitlines():
                out_line = out_line.strip()
                if out_line.startswith("{"):
                    line = out_line
            if proc.returncode != 0 or line is None:
                failures += 1
                record = {"config": config, "ok": False,
                          "returncode": proc.returncode,
                          "stderr_tail": proc.stderr[-500:]}
            else:
                record = json.loads(line)
                record["config"] = config
                record["ok"] = True
            record["wall_seconds"] = round(time.time() - t0, 1)
            record["captured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
            log.write(json.dumps(record) + "\n")
            log.flush()
            print(json.dumps(record), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
