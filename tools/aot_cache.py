"""Cold-start mitigation experiment: AOT executable serialization.

The axon PJRT plugin ignores JAX's persistent compilation cache (nothing is
written under ``jax_compilation_cache_dir``; a fresh process recompiles the
pipeline for ~215 s — CLAUDE.md). This probes the remaining option:
``jax.experimental.serialize_executable`` (pickling a *compiled* executable
and reloading it without recompiling).

Run twice:
    python tools/aot_cache.py save [H W NDISP]   # compile + serialize
    python tools/aot_cache.py load [H W NDISP]   # fresh process, deserialize

and compare the ``load`` wall-clock against the ~215 s cold compile. If the
plugin rejects serialization, the failure mode is recorded here so the
serving plan in BASELINE.md stays honest.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/mccnn_aot_pipeline.bin"


def build(height: int, width: int, ndisp: int):
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig

    config = MatchConfig()
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    right = jnp.asarray(rng.normal(size=(height, width)).astype(np.float32))
    fn = jax.jit(lambda p, l, r: match_pair(p, l, r, ndisp, config))
    return fn, (params, left, right)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    shape = [int(a) for a in sys.argv[2:5]] or [1000, 1504, 200]
    height, width, ndisp = shape

    import jax
    import jax.numpy as jnp
    from jax.experimental import serialize_executable

    fn, args = build(height, width, ndisp)
    sync = jax.jit(lambda d: jnp.sum(d))

    if mode == "save":
        t0 = time.time()
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        import pickle

        blob = serialize_executable.serialize(compiled)
        with open(CACHE, "wb") as f:
            pickle.dump(blob, f)
        print(
            f"serialize: {time.time() - t0:.1f}s "
            f"({os.path.getsize(CACHE) / 1e6:.1f} MB) -> {CACHE}",
            file=sys.stderr,
        )
        out = compiled(*args)
        print(f"checksum {float(np.asarray(sync(out))):.1f}", file=sys.stderr)
    else:
        import pickle

        t0 = time.time()
        with open(CACHE, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        compiled = serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree
        )
        print(f"deserialize+load: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        out = compiled(*args)
        checksum = float(np.asarray(sync(out)))
        print(
            f"first call from cache: {time.time() - t0:.2f}s "
            f"(checksum {checksum:.1f})",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
