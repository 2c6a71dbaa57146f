"""Probe: do remote (axon) compiles of DIFFERENT programs overlap?

The serving cold-start plan (BASELINE.md "Serving") warms every announced
shape bucket sequentially; if the terminal-side compiler accepts concurrent
requests, a threaded warmup pays ~max(compile) instead of sum(compile).
This times two fresh-shape pipeline compiles sequentially vs two other
fresh shapes compiled from two threads (4 distinct shapes — the terminal
cache would confound reuse).

    python tools/probe_compile_overlap.py
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig

    params = init_params(jax.random.key(0))
    config = MatchConfig()

    def compile_one(height, width, ndisp, tag, out):
        fn = jax.jit(lambda p, l, r: match_pair(
            p, l, r, ndisp, config, volume_dtype="bfloat16"))
        left = jnp.zeros((height, width), jnp.float32)
        t0 = time.time()
        compiled = fn.lower(params, left, left).compile()
        dt = time.time() - t0
        out[tag] = dt
        print(f"  compile {tag} {height}x{width}x{ndisp}: {dt:.1f}s",
              flush=True)
        return compiled

    out = {}
    t0 = time.time()
    compile_one(448, 640, 100, "seq_a", out)
    compile_one(448, 704, 128, "seq_b", out)
    seq_total = time.time() - t0
    print(f"sequential total: {seq_total:.1f}s", flush=True)

    t0 = time.time()
    threads = [
        threading.Thread(target=compile_one, args=(512, 640, 100, "thr_a", out)),
        threading.Thread(target=compile_one, args=(512, 704, 128, "thr_b", out)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    thr_total = time.time() - t0
    print(f"threaded total:   {thr_total:.1f}s", flush=True)
    print(f"VERDICT: threaded/sequential = {thr_total / seq_total:.2f} "
          f"(<0.75 = compiles overlap; ~1.0 = serialized server)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
