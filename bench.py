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
import os
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
    # ABSOLUTE error against the exact stencil on the same input — never a
    # |diff|/(|ref|+eps) metric, which spikes wherever the aggregated cost
    # crosses zero and falsely condemns low-precision variants (CLAUDE.md).
    # Both kernels here are f32/HIGHEST, so the bound is accumulation-order
    # noise on O(1) operands.
    for name, agg in (
        ("fused", lambda v, a: cbca_fused(v, a, 2, 14)),
        ("rolling", None),
    ):
        if agg is None:
            from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

            agg = lambda v, a: cbca_fused_rolling(v, a, 2, 14)  # noqa: E731
        gf = np.asarray(jax.jit(agg)(jnp.asarray(vol), arms))
        gx = np.asarray(jax.jit(lambda v, a: cbca(v, a, 2, 14))(
            jnp.asarray(vol), arms))
        err = float(np.max(np.abs(gf - gx)))
        status = "OK" if err < 1e-3 else "FAIL"
        print(f"parity cbca-{name} vs xla: max abs err {err:.2e} [{status}]",
              file=sys.stderr)
        if err >= 1e-3:
            raise SystemExit(f"on-TPU parity failure: cbca_{name}")


def _stage_profile(params, left, right, ndisp: int, config,
                   match_kwargs: dict, pair_seconds: float | None = None) -> dict:
    """Stage-isolated breakdown (ms) + achieved rates for the MXU stages.

    Each stage is timed as its own jitted program at the PIPELINE's dtypes
    (the fused pipeline can be faster than the sum — XLA fuses producers
    into the SGM scans, donates buffers, overlaps stages — so these are
    attribution numbers, not a decomposition; the emitted key says
    "isolated" so a schedule regression can't hide behind them). When
    ``pair_seconds`` is given, an in-pipeline estimate is added: the
    measured pair time split by the isolated-probe fractions.
    """
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import extract_features
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.ops.cost_volume import cost_volume_pair
    from mccnn_tpu.ops.filters import bilateral_filter, median_filter
    from mccnn_tpu.ops.lr_check import lr_consistency_interpolate
    from mccnn_tpu.ops.sgm import _directional_sweep
    from mccnn_tpu.ops.subpixel import subpixel_enhance
    from mccnn_tpu.ops.wta import wta_disparity

    height, width = left.shape
    on_tpu = jax.default_backend() != "cpu"

    def timed(fn, *args, iters=5):
        # enough chained dispatches to amortize the ~31 ms tunnel
        # round-trip of the final sync fetch (CLAUDE.md)
        sync = jax.jit(
            lambda t: jnp.sum(jax.tree.leaves(t)[0].astype(jnp.float32))
        )
        out = fn(*args)
        np.asarray(sync(out))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(sync(out))
        return out, (time.time() - t0) / iters

    stages = {}

    feats_fn = jax.jit(lambda p, a, b: (extract_features(p, a),
                                        extract_features(p, b)))
    (fl, fr), dt = timed(feats_fn, params, left, right)
    stages["features"] = dt
    # 5-layer VALID 3x3 stack, 1->64 then 64->64 x4, both images
    conv_flops = 2 * height * width * 2 * 9 * 64 * (1 + 4 * 64)
    feat_tflops = conv_flops / dt / 1e12

    method = match_kwargs.get("cost_volume_method", "auto")
    if method == "auto":
        method = "pallas" if on_tpu else "matmul"
    cv_fn = jax.jit(lambda a, b: cost_volume_pair(a, b, ndisp, method=method))
    (lcv, rcv), dt = timed(cv_fn, fl, fr)
    stages["cost_volume"] = dt
    cv_tflops = 2 * height * width * ndisp * 64 * 2 / dt / 1e12  # useful only

    vol_dtype = match_kwargs.get("volume_dtype", "float32")
    lcv = lcv.astype(vol_dtype)
    impl = match_kwargs.get("cbca_impl", "auto")
    if impl == "auto":  # mirror pipeline.match_pair's auto resolution
        if not on_tpu:
            impl = "xla"
        else:
            impl = "fused" if vol_dtype == "bfloat16" else "fused16"
    if impl == "mxu":
        from mccnn_tpu.ops.cbca_mxu import cbca_mxu as agg
    elif impl == "fused":
        from mccnn_tpu.ops.cbca_fused import cbca_fused as agg
    elif impl == "fused16":
        import functools

        from mccnn_tpu.ops.cbca_fused import cbca_fused

        agg = functools.partial(cbca_fused, compute_dtype=jnp.bfloat16)
    elif impl == "rolling":
        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling as agg
    elif impl == "rolling16":
        import functools

        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

        agg = functools.partial(cbca_fused_rolling, compute_dtype=jnp.bfloat16)
    else:
        agg = cbca
    arms = jax.jit(lambda i: compute_arms(i, config.cbca_intensity,
                                          int(config.cbca_distance)))(left)
    rounds = 2 * (config.cbca_num_iterations_1 + config.cbca_num_iterations_2)
    _, dt = timed(jax.jit(
        lambda v, a: agg(v, a, 1, int(config.cbca_distance))), lcv, arms)
    stages["cbca"] = dt * rounds
    d_pad = -(-ndisp // 128) * 128
    # the bandwidth-bound stage: volume read+write per round
    cbca_gbps = (2 * height * width * d_pad * lcv.dtype.itemsize) / dt / 1e9

    sgm_t = 0.0
    for axis in ((0, 1), (1, 0)):
        sweep = jax.jit(lambda v, a, b, ax=axis: _directional_sweep(
            v, a, b, "L", ax, ndisp, config))
        _, dt = timed(sweep, lcv.astype(jnp.float32), left, right)
        sgm_t += 4 * dt  # 2 directions x 2 volumes per axis
    stages["sgm"] = sgm_t

    def post(lv, rv, img):
        dl, dr = wta_disparity(lv), wta_disparity(rv)
        disp = lr_consistency_interpolate(dl, dr, ndisp)
        disp = subpixel_enhance(disp, lv, ndisp)
        disp = median_filter(disp, 5, 5)
        return bilateral_filter(img, disp, 5, 5, 0.0, config.blur_sigma,
                                config.blur_threshold)

    lcv32 = lcv.astype(jnp.float32)
    _, dt = timed(jax.jit(post), lcv32, lcv32, left)
    stages["post"] = dt

    result = {k: round(v * 1e3, 1) for k, v in stages.items()}
    result["cbca_ms_per_round"] = round(stages["cbca"] / rounds * 1e3, 1)
    record = {
        "stages_ms_isolated": result,
        "mxu_tflops": {"features": round(feat_tflops, 2),
                       "cost_volume": round(cv_tflops, 2)},
        "cbca_volume_gbps": round(cbca_gbps, 1),
        "cbca_impl": impl,
    }
    if pair_seconds is not None:
        total = sum(stages.values())
        record["stages_in_pipeline_est_ms"] = {
            k: round(pair_seconds * v / total * 1e3, 1)
            for k, v in stages.items()
        }
    return record


def main(height: int = 1000, width: int = 1504, ndisp: int = 200,
         label: str = "halfres_full_pipeline_megapixels_per_s",
         match_kwargs: dict | None = None, parity: bool = True,
         stages: bool = True, schedule: str | None = "bf16_fused") -> None:
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models.net import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.config import MatchConfig

    config = MatchConfig()  # paper defaults: CBCA 2+16 iters, 4-dir SGM
    if match_kwargs is None:
        # The default TPU serving configuration: bf16 volume storage with
        # the fused CBCA kernel (parity pinned to the exact pipeline by
        # tests/test_parity_metrics.py; exact f32 via --config halfexact).
        match_kwargs = {"volume_dtype": "bfloat16"}
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

    record = {
        "metric": label,
        "value": round(mpix_per_s, 4),
        "unit": "MP/s",
        "vs_baseline": round(mpix_per_s / TARGET_MPS, 4),
        "seconds_per_pair": round(best, 3),
    }
    if schedule is not None:
        record["schedule"] = schedule
    if stages and "--no-stages" not in sys.argv:
        try:
            record.update(_stage_profile(params, left, right, ndisp, config,
                                         match_kwargs, pair_seconds=best))
        except Exception as exc:  # noqa: BLE001 — stage attribution must
            # never sink the headline metric (extra compiles, OOM at odd
            # shapes, transient remote-compile flakes)
            print(f"stage profile failed: {str(exc)[:200]}", file=sys.stderr)
    print(json.dumps(record))


def bench_quarter() -> None:
    main(500, 736, 100, "quarterres_full_pipeline_megapixels_per_s",
         parity=False, stages=False)


def bench_half_exact() -> None:
    """Half-res with exact-f32 volumes and the exact fused CBCA kernel —
    the strict-parity configuration (oracle-bit-matching aggregation)."""
    main(label="halfres_exact_f32_pipeline_megapixels_per_s",
         match_kwargs={"cbca_impl": "fused"}, parity=False,
         schedule="exact_f32")


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
            # 256-chunks give the kernel's in-kernel d-loop n_chunks=2 per
            # call, so window DMAs double-buffer against compute (128-chunks
            # leave n_chunks=1: every window fetch serialized with its
            # tile's matmuls) while bounding the call's live volume to
            # half; fully unchunked (D=512 per call) fails to fit full-res
            # HBM at compile (measured)
            "cbca_chunk_d": int(os.environ.get("CBCA_CHUNK_D", "256")),
        },
        parity=False,
        schedule="bf16_fused_sequential",
        # stage-isolated full-res jits OOM HBM without the pipeline's
        # buffer donation (CLAUDE.md) — the half-res stage dict is the
        # per-stage evidence
        stages=False,
    )


if __name__ == "__main__":
    if "--config" in sys.argv:
        which = sys.argv[sys.argv.index("--config") + 1]
        {"half": main, "halfexact": bench_half_exact,
         "quarter": bench_quarter, "train": bench_train,
         "full": bench_full}[which]()
    else:
        main()
