"""Benchmark: full matching pipeline throughput on one chip.

Runs the complete pipeline (features -> cost volume -> CBCA(2) -> SGM ->
CBCA(16) -> WTA -> LR -> subpixel -> median -> bilateral) with the paper's
Middlebury hyperparameters on a synthetic pair.

Configs (--config):
  half (default): 1000 x 1504, ndisp 200 — Middlebury v3 half-res scale.
  quarter:        500 x 736, ndisp 100.
  full:           2000 x 3008, ndisp 400 — full-res scale; runs the
                  full-resolution schedule (bf16 volumes, d-chunked fused
                  CBCA, sequential right-then-left volumes) so the ~6 MP /
                  ndisp-400 problem fits one chip's HBM.
  train:          training-step throughput (128-triplet batches).

Baseline context (BASELINE.md): the reference publishes no numbers — its
post-processing is per-pixel Python (days per pair at this size); the
driver-defined target is < 5 s per half-res pair on one chip, i.e.
0.3 MP/s. ``vs_baseline`` is measured MP/s over that 0.3 MP/s target.

After the timed run the default config also executes an on-device parity
check of the Pallas kernels against their XLA counterparts (guarding
Mosaic-vs-interpret drift — the unit tests run the kernels in interpret
mode on CPU) and prints one line per kernel to stderr.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_MPS = (1000 * 1504 / 1e6) / 5.0  # the <5 s half-res north-star


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


def _parity_check() -> None:
    """On-device Pallas-vs-XLA parity (Mosaic semantics, not interpret)."""
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cbca_fused import cbca_fused
    from mccnn_tpu.ops.cost_volume import cost_volume_pair

    rng = np.random.default_rng(1)
    height, width, ndisp = 96, 256, 32
    fl = rng.normal(size=(height, width, 64)).astype(np.float32)
    fl /= np.linalg.norm(fl, axis=-1, keepdims=True)
    fr = rng.normal(size=(height, width, 64)).astype(np.float32)
    fr /= np.linalg.norm(fr, axis=-1, keepdims=True)

    pall = jax.jit(lambda a, b: cost_volume_pair(a, b, ndisp, method="pallas"))
    xla = jax.jit(lambda a, b: cost_volume_pair(a, b, ndisp, method="matmul"))
    got = pall(jnp.asarray(fl), jnp.asarray(fr))
    ref = xla(jnp.asarray(fl), jnp.asarray(fr))
    for side, g, r in zip(("left", "right"), got, ref):
        err = float(np.max(np.abs(np.asarray(g) - np.asarray(r))))
        status = "OK" if err < 1e-4 else "FAIL"
        print(f"parity band-kernel {side} vs xla: max abs err {err:.2e} "
              f"[{status}]", file=sys.stderr)
        if err >= 1e-4:
            raise SystemExit(f"on-TPU parity failure: band {side}")

    image = rng.normal(size=(height, width)).astype(np.float32)
    vol = np.asarray(got[0])
    arms = jax.jit(lambda i: compute_arms(i, 0.02, 14))(jnp.asarray(image))
    agg_f = jax.jit(lambda v, a: cbca_fused(v, a, 2, 14))
    agg_x = jax.jit(lambda v, a: cbca(v, a, 2, 14))
    gf = np.asarray(agg_f(jnp.asarray(vol), arms))
    gx = np.asarray(agg_x(jnp.asarray(vol), arms))
    err = float(np.max(np.abs(gf - gx) / (np.abs(gx) + 1e-3)))
    status = "OK" if err < 1e-4 else "FAIL"
    print(f"parity cbca-fused vs xla: max rel err {err:.2e} [{status}]",
          file=sys.stderr)
    if err >= 1e-4:
        raise SystemExit("on-TPU parity failure: cbca_fused")


def main(height: int = 1000, width: int = 1504, ndisp: int = 200,
         label: str = "halfres_full_pipeline_megapixels_per_s",
         match_kwargs: dict | None = None, parity: bool = True) -> None:
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig

    config = MatchConfig()  # paper defaults: CBCA 2+16 iters, 4-dir SGM
    match_kwargs = match_kwargs or {}
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    base = rng.normal(size=(height, width)).astype(np.float32)
    left = jnp.asarray((base - base.mean()) / base.std())
    shifted = np.roll(base, -12, axis=1) + 0.05 * rng.normal(
        size=(height, width)
    ).astype(np.float32)
    right = jnp.asarray((shifted - shifted.mean()) / shifted.std())

    fn = jax.jit(
        lambda p, l, r: match_pair(p, l, r, ndisp, config, **match_kwargs)
    )
    # block_until_ready can be a no-op on tunneled platforms; a scalar
    # reduction fetched to host is the reliable sync
    sync = jax.jit(lambda d: jnp.sum(d))

    t0 = time.time()
    # the remote-compile service occasionally 500s on a bad endpoint
    # (transient; a retry is routed elsewhere) — don't let one flake kill
    # the whole bench run
    for attempt in range(3):
        try:
            out = fn(params, left, right)
            checksum = float(np.asarray(sync(out)))
            break
        except Exception as exc:  # noqa: BLE001
            if attempt == 2 or "remote_compile" not in str(exc):
                raise
            print(f"first call failed (attempt {attempt + 1}), retrying: "
                  f"{str(exc)[:120]}", file=sys.stderr)
            time.sleep(5)
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
    mpix_per_s = height * width / 1e6 / best
    print(f"steady-state: {best:.3f}s per pair ({mpix_per_s:.2f} MP/s)",
          file=sys.stderr)

    if parity:
        _parity_check()

    print(json.dumps({
        "metric": label,
        "value": round(mpix_per_s, 4),
        "unit": "MP/s",
        "vs_baseline": round(mpix_per_s / TARGET_MPS, 4),
    }))


def bench_quarter() -> None:
    main(500, 736, 100, "quarterres_full_pipeline_megapixels_per_s",
         parity=False)


def bench_full() -> None:
    """Full-res scale: the bf16 / d-chunked / sequential-volume schedule.

    Width 3072 = the 128-bucket the serving path (MatchPipeline) would pad
    a ~3000-px Middlebury scene to anyway; lane-aligned W means the band
    kernel's output IS the pipeline volume (no crop copy of a 6 GB array).
    """
    main(
        2000, 3072, 400, "fullres_full_pipeline_megapixels_per_s",
        match_kwargs={
            "cbca_impl": "fused",
            "volume_dtype": "bfloat16",
            "cbca_chunk_d": 128,
        },
        parity=False,
    )


if __name__ == "__main__":
    if "--config" in sys.argv:
        which = sys.argv[sys.argv.index("--config") + 1]
        {"half": main, "quarter": bench_quarter, "train": bench_train,
         "full": bench_full}[which]()
    else:
        main()
