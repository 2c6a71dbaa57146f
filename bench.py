"""Benchmark: full matching pipeline throughput on one chip.

Runs the complete pipeline (features -> cost volume -> CBCA(2) -> SGM ->
CBCA(16) -> WTA -> LR -> subpixel -> median -> bilateral) with the paper's
Middlebury hyperparameters on a synthetic half-res-scale pair
(1000 x 1504, ndisp 200 — Middlebury v3 half-res is ~1500x1000 with ndisp
up to ~200).

Baseline context (BASELINE.md): the reference publishes no numbers — its
post-processing is per-pixel Python (days per pair at this size); the
driver-defined target is < 5 s per half-res pair on one chip, i.e.
0.3 MP/s. ``vs_baseline`` is measured MP/s over that 0.3 MP/s target.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HEIGHT, WIDTH, NDISP = 1000, 1504, 200
TARGET_MPS = (HEIGHT * WIDTH / 1e6) / 5.0  # the <5 s north-star
LABEL = "halfres_full_pipeline_megapixels_per_s"


def bench_quarter() -> None:
    """Quarter-res-scale config (BASELINE.md config 1 analogue)."""
    global HEIGHT, WIDTH, NDISP, LABEL
    HEIGHT, WIDTH, NDISP = 500, 736, 100
    LABEL = "quarterres_full_pipeline_megapixels_per_s"
    main()


def bench_train() -> None:
    """Training-step throughput (128-triplet batches)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.pipeline.train import make_optimizer, make_train_step
    from mccnn_tpu.utils.config import TrainConfig

    config = TrainConfig()
    params = init_params(jax.random.key(0))
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    step = make_train_step(config, optimizer)
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.normal(size=(128, 11, 11, 1)).astype(np.float32))
        for _ in range(3)
    )
    params, opt_state, loss = step(params, opt_state, batch)
    print(f"first step loss {float(loss):.4f}", file=sys.stderr)
    iters = 50
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    float(loss)  # sync
    per_step = (time.time() - t0) / iters
    print(json.dumps({
        "metric": "train_steps_per_s_batch128",
        "value": round(1.0 / per_step, 2),
        "unit": "steps/s",
        "vs_baseline": 1.0,
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig

    config = MatchConfig()  # paper defaults: CBCA 2+16 iters, 4-dir SGM
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    base = rng.normal(size=(HEIGHT, WIDTH)).astype(np.float32)
    left = jnp.asarray((base - base.mean()) / base.std())
    shifted = np.roll(base, -12, axis=1) + 0.05 * rng.normal(
        size=(HEIGHT, WIDTH)
    ).astype(np.float32)
    right = jnp.asarray((shifted - shifted.mean()) / shifted.std())

    fn = jax.jit(lambda p, l, r: match_pair(p, l, r, NDISP, config))
    # block_until_ready can be a no-op on tunneled platforms; a scalar
    # reduction fetched to host is the reliable sync
    sync = jax.jit(lambda d: jnp.sum(d))

    t0 = time.time()
    out = fn(params, left, right)
    checksum = float(np.asarray(sync(out)))
    compile_and_first = time.time() - t0
    print(f"first call (incl. compile): {compile_and_first:.2f}s "
          f"(checksum {checksum:.1f})", file=sys.stderr)

    def timed(iters: int) -> float:
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(params, left, right)
        np.asarray(sync(out))  # device queue is in-order: syncs all iters
        return (time.time() - t0) / iters

    timed(1)  # warm the dispatch path
    best = min(timed(3) for _ in range(3))
    mpix_per_s = HEIGHT * WIDTH / 1e6 / best
    print(f"steady-state: {best:.3f}s per pair ({mpix_per_s:.2f} MP/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": LABEL,
        "value": round(mpix_per_s, 4),
        "unit": "MP/s",
        "vs_baseline": round(mpix_per_s / TARGET_MPS, 4),
    }))


if __name__ == "__main__":
    if "--config" in sys.argv:
        which = sys.argv[sys.argv.index("--config") + 1]
        {"half": main, "quarter": bench_quarter, "train": bench_train}[which]()
    else:
        main()
