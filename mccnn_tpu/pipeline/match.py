"""The full matching pipeline as a single device-resident jitted program.

Pipeline stages (reference: src/match.py:131-176): features -> cost volume
-> CBCA (iters_1) -> SGM -> CBCA (iters_2) -> WTA -> LR-consistency
interpolation -> subpixel -> 5x5 median -> 5x5 bilateral.

Where the reference round-trips every stage through host NumPy (and builds a
fresh TF graph + session per image, reference: src/process_functional.py:28-43),
this pipeline is traced once per (H, W, ndisp) shape bucket and runs
entirely on device; the only host<->device transfers are the two input
images in and one disparity map out.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mccnn_tpu.models.net import Params, extract_features
from mccnn_tpu.ops.cbca import cbca, compute_arms
from mccnn_tpu.ops.cost_volume import cost_volume_pair
from mccnn_tpu.ops.filters import bilateral_filter, median_filter
from mccnn_tpu.ops.lr_check import lr_consistency_interpolate
from mccnn_tpu.ops.sgm import _sgm_one_volume
from mccnn_tpu.ops.subpixel import subpixel_enhance
from mccnn_tpu.ops.wta import wta_disparity
from mccnn_tpu.utils.config import MatchConfig


def _cbca_aggregate(cbca_impl: str):
    """Resolve a (resolved, non-"auto") CBCA impl name to its callable."""
    if cbca_impl == "pallas":
        from mccnn_tpu.ops.cbca_pallas import cbca_pallas as aggregate
    elif cbca_impl == "mxu":
        from mccnn_tpu.ops.cbca_mxu import cbca_mxu as aggregate
    elif cbca_impl == "fused":
        from mccnn_tpu.ops.cbca_fused import cbca_fused as aggregate
    elif cbca_impl == "fused16":
        # f32 storage between stages, bf16 phase-1 multiplies in-kernel
        # (the mxu numerics class, without the dense HBM mask stacks)
        import functools as _functools

        from mccnn_tpu.ops.cbca_fused import cbca_fused

        aggregate = _functools.partial(cbca_fused,
                                       compute_dtype=jnp.bfloat16)
    elif cbca_impl == "fused2":
        # two rounds per HBM pass: -30% volume traffic on the DMA-bound
        # round at +57% MACs (ops/cbca_fused2.py)
        from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two as aggregate
    elif cbca_impl == "fused2_16":
        # two-round passes with f32 storage and bf16 multiplies
        import functools as _functools

        from mccnn_tpu.ops.cbca_fused2 import cbca_fused_two

        aggregate = _functools.partial(cbca_fused_two,
                                       compute_dtype=jnp.bfloat16)
    elif cbca_impl == "fused8":
        # int8 storage between rounds: half the DMA bytes of bf16 on the
        # DMA-bound round; exact integer in-kernel math, one symmetric
        # quantization per CBCA block (ops/cbca_fused.py int8_storage)
        import functools as _functools

        from mccnn_tpu.ops.cbca_fused import cbca_fused

        aggregate = _functools.partial(cbca_fused, int8_storage=True)
    elif cbca_impl == "rolling":
        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling as aggregate
    elif cbca_impl == "rolling16":
        # rolling-row window (each volume row DMA'd once per round) with
        # f32 storage and bf16 phase-1 multiplies — fused16's numerics
        import functools as _functools

        from mccnn_tpu.ops.cbca_rolling import cbca_fused_rolling

        aggregate = _functools.partial(cbca_fused_rolling,
                                       compute_dtype=jnp.bfloat16)
    else:
        aggregate = cbca
    return aggregate


def match_pair(
    params: Params,
    left_image: jax.Array,
    right_image: jax.Array,
    ndisp: int,
    config: MatchConfig = MatchConfig(),
    cost_volume_method: str = "auto",
    constrain=None,
    cbca_impl: str = "auto",
    volume_dtype: str = "float32",
    cbca_chunk_d: int = 0,
    cost_volume_fn=None,
    cbca_fn=None,
    recompute_features: bool | str = "auto",
    return_volumes: bool = False,
    features_dtype: str = "auto",
) -> jax.Array:
    """(H, W) standardized image pair -> (H, W) float32 disparity map.

    Pure function of its inputs; ``ndisp``, ``config``, the method
    selectors must be static under jit. ``constrain``, if given, is
    applied to each (H, W, D) volume between stages — the hook
    mccnn_tpu.parallel.match uses to pin a mesh sharding on the volumes.

    "auto" methods pick the Pallas kernels on TPU (the gather-free band
    kernel and the fused CBCA iteration kernel) and the pure-XLA paths on
    other backends.

    ``volume_dtype="bfloat16"`` stores the cost volumes in bf16 (DP math
    and CBCA accumulation stay f32) and ``cbca_chunk_d=128`` aggregates
    the disparity axis in chunks — together these bound peak HBM at
    ~2.5 volume-chunks, which is what fits a ~6 MP / ndisp-400 pair on one
    chip (the full-resolution schedule; see BASELINE.md).

    ``cost_volume_fn(features_left, features_right, sides)`` and
    ``cbca_fn(volume, arms, iterations)``, when given, override the
    selected implementations — the hook mccnn_tpu.parallel.match uses to
    substitute shard_map-wrapped Pallas kernels (manual-DMA kernels are
    single-device programs; GSPMD cannot partition them, but shard_map
    runs them per shard with explicit halo exchange).

    ``features_dtype`` ("auto"/"float32"/"bfloat16") sets the conv-stack
    compute dtype. "auto" = f32: measured on v5e, an explicit bf16 stack
    is bit-identical and no faster — XLA already lowers f32 convs at
    DEFAULT (1-bf16-pass) precision on TPU (models/net.py).

    ``return_volumes=True`` returns a dict with the final disparity plus
    the fully-processed pre-WTA volumes and per-side WTA maps — the
    deterministic intermediates that sharded-vs-unsharded equality tests
    compare exactly (argmin tie excuses do not apply upstream of WTA).
    """
    on_tpu = jax.default_backend() == "tpu"
    vdtype = jnp.dtype(volume_dtype)
    if cost_volume_method == "auto":
        cost_volume_method = "pallas" if on_tpu else "matmul"
    if cbca_impl == "auto":
        # the fused VMEM-mask kernel with bf16 phase-1 multiplies is the
        # fastest TPU aggregation at every measured shape (14-20 ms/round
        # at half-res vs 24 dense-mxu / 30 exact-fused / 116 vpu-stencil)
        # and quantizes ONLY the round's multiplicands — use
        # cbca_impl="pallas"/"xla"/"fused" for exact f32 parity
        if not on_tpu:
            cbca_impl = "xla"
        else:
            cbca_impl = "fused" if vdtype == jnp.bfloat16 else "fused16"
    if constrain is None:
        constrain = lambda v: v  # noqa: E731
    if features_dtype == "auto":
        # measured: XLA TPU already lowers f32 convs at DEFAULT precision
        # (bf16 passes) — an explicit bf16 conv stack is bit-identical
        # and equally fast (18.9 vs 19.0 ms at half-res), so auto stays
        # f32 everywhere; the knob remains for explicit experiments
        features_dtype = "float32"
    fdtype = jnp.dtype(features_dtype)
    fcompute = fdtype if fdtype == jnp.bfloat16 else None
    features_left = extract_features(params, left_image, fcompute)
    features_right = extract_features(params, right_image, fcompute)

    distance = int(config.cbca_distance)
    aggregate = _cbca_aggregate(cbca_impl)

    def run_cbca(volume, arms, iterations, kwargs):
        d_pad = volume.shape[2]
        if not cbca_chunk_d or d_pad <= cbca_chunk_d:
            return aggregate(volume, arms, iterations, distance, **kwargs)
        if d_pad % cbca_chunk_d:
            raise ValueError("cbca_chunk_d must divide the padded depth")
        # aggregation is independent per disparity: chunking the d axis
        # caps the round double-buffer at chunk size (full-res memory)
        def body(c, vol):
            start = c * cbca_chunk_d
            block = lax.dynamic_slice_in_dim(vol, start, cbca_chunk_d, axis=2)
            block = aggregate(block, arms, iterations, distance, **kwargs)
            return lax.dynamic_update_slice_in_dim(vol, block, start, axis=2)

        return lax.fori_loop(0, d_pad // cbca_chunk_d, body, volume)

    def process_volume(volume, image, choice):
        """CBCA(iters1) -> SGM -> CBCA(iters2) for one volume.

        Per-volume processing (the stages are independent between volumes)
        keeps only one image's CBCA state live at a time — with the MXU
        aggregation that halves mask-build work and peak mask memory.
        """
        arms = compute_arms(image, config.cbca_intensity, distance)
        kwargs = {}
        aggregate_fn = run_cbca
        if cbca_fn is not None:
            def aggregate_fn(volume, arms, iterations, kwargs):
                return cbca_fn(volume, arms, iterations)
        elif config.cbca_joint_regions:
            from mccnn_tpu.ops.cbca_joint import cbca_joint

            other = right_image if choice == "L" else left_image
            arms_other = compute_arms(other, config.cbca_intensity, distance)

            def aggregate_fn(volume, arms, iterations, kwargs):
                return cbca_joint(volume, arms, arms_other, iterations,
                                  distance, ndisp, choice)
        elif cbca_impl == "mxu":
            from mccnn_tpu.ops.cbca_mxu import build_masks

            kwargs["masks"] = build_masks(arms)
        volume = constrain(
            aggregate_fn(volume, arms, config.cbca_num_iterations_1, kwargs)
        )
        volume = constrain(
            _sgm_one_volume(volume, left_image, right_image, choice, ndisp,
                            config)
        )
        return constrain(
            aggregate_fn(volume, arms, config.cbca_num_iterations_2, kwargs)
        )

    if cost_volume_method == "pallas" or cost_volume_fn is not None:
        default_band = cost_volume_fn is None
        if default_band:
            def cost_volume_fn(fl, fr, sides):
                return cost_volume_pair(fl, fr, ndisp, method="pallas",
                                        sides=sides, dtype=vdtype)

        # Build and process one volume at a time, right first: the right
        # volume reduces to its disparity map before the left volume (which
        # stays live through LR-interpolation and subpixel) materializes.
        # The barrier forces that schedule, pinning peak HBM at one volume
        # plus one round double-buffer — the full-resolution budget.
        if vdtype == jnp.bfloat16 and default_band:
            # the band kernel's 1-pass DEFAULT correlation rounds f32
            # features to bf16 in-register anyway (ops/cost_volume_pallas),
            # so casting the descriptor maps once here is BIT-IDENTICAL —
            # and holding the 1.45 GB bf16 copies across the right-volume
            # phase is cheaper than the ~156 ms of feature recomputation
            # the f32 maps (2.9 GB) used to force at full-res
            features_left = features_left.astype(jnp.bfloat16)
            features_right = features_right.astype(jnp.bfloat16)
        if recompute_features == "auto":
            # custom cost_volume_fn (the sharded matcher) keeps the f32
            # recompute schedule; the default band path holds bf16 maps
            recompute_features = (
                vdtype == jnp.bfloat16 and not default_band
            )
        right_volume = constrain(
            cost_volume_fn(features_left, features_right, "right")
        )
        right_volume = process_volume(right_volume, right_image, "R")
        right_disparity = wta_disparity(right_volume)
        if recompute_features:
            # the images must pass THROUGH the barrier: otherwise the left
            # feature extraction (and the left band kernel) depends only on
            # pre-barrier values and the scheduler hoists it next to the
            # right volume — two live volumes, the exact peak this
            # schedule exists to avoid
            right_disparity, limg, rimg = lax.optimization_barrier(
                (right_disparity, left_image, right_image)
            )
            features_left = extract_features(params, limg, fcompute)
            features_right = extract_features(params, rimg, fcompute)
        else:
            features_left, features_right, right_disparity = (
                lax.optimization_barrier(
                    (features_left, features_right, right_disparity)
                )
            )
        left_volume = constrain(
            cost_volume_fn(features_left, features_right, "left")
        )
        left_volume = process_volume(left_volume, left_image, "L")
        left_disparity = wta_disparity(left_volume)
    else:
        left_volume, right_volume = cost_volume_pair(
            features_left, features_right, ndisp,
            method=cost_volume_method, dtype=vdtype,
        )
        left_volume = constrain(left_volume)
        right_volume = constrain(right_volume)
        left_volume = process_volume(left_volume, left_image, "L")
        right_volume = process_volume(right_volume, right_image, "R")
        left_disparity = wta_disparity(left_volume)
        right_disparity = wta_disparity(right_volume)

    disparity = lr_consistency_interpolate(left_disparity, right_disparity, ndisp)
    disparity = subpixel_enhance(disparity, left_volume, ndisp)
    disparity = median_filter(
        disparity, config.median_filter_size, config.median_filter_size
    )
    disparity = bilateral_filter(
        left_image,
        disparity,
        config.bilateral_filter_size,
        config.bilateral_filter_size,
        0.0,
        config.blur_sigma,
        config.blur_threshold,
    )
    if return_volumes:
        return {
            "disparity": disparity,
            "left_volume": left_volume,
            "right_volume": right_volume,
            "left_disparity": left_disparity,
            "right_disparity": right_disparity,
        }
    return disparity


def standardize_image(image: np.ndarray) -> np.ndarray:
    """(x - mean) / std over the whole image (reference: src/match.py:120-121)."""
    image = image.astype(np.float32)
    return (image - image.mean()) / image.std()


def _build_staged(config: MatchConfig, ndisp: int, cost_volume_method: str,
                  cbca_impl: str, volume_dtype: str, cbca_chunk_d: int):
    """Ten stage-isolated jitted programs for ``MatchPipeline.stage_times``.

    Same impl auto-resolution as ``match_pair``; each stage consumes and
    extends a state dict. Stage names follow the reference's per-stage
    prints (reference: src/match.py:126-176). Joint-region CBCA is not
    supported in this observability mode.
    """
    on_tpu = jax.default_backend() == "tpu"
    vdtype = jnp.dtype(volume_dtype)
    method = cost_volume_method
    if method == "auto":
        method = "pallas" if on_tpu else "matmul"
    impl = cbca_impl
    if impl == "auto":
        if not on_tpu:
            impl = "xla"
        else:
            impl = "fused" if vdtype == jnp.bfloat16 else "fused16"
    aggregate = _cbca_aggregate(impl)
    distance = int(config.cbca_distance)

    def run_cbca(volume, arms, iterations):
        d_pad = volume.shape[2]
        if not cbca_chunk_d or d_pad <= cbca_chunk_d:
            return aggregate(volume, arms, iterations, distance)

        def body(c, vol):
            start = c * cbca_chunk_d
            block = lax.dynamic_slice_in_dim(vol, start, cbca_chunk_d, axis=2)
            block = aggregate(block, arms, iterations, distance)
            return lax.dynamic_update_slice_in_dim(vol, block, start, axis=2)

        return lax.fori_loop(0, d_pad // cbca_chunk_d, body, volume)

    def features(s):
        s = dict(s)
        params = s.pop("params")
        s["features_left"] = extract_features(params, s["left"])
        s["features_right"] = extract_features(params, s["right"])
        return s

    def cost_volume(s):
        s = dict(s)
        lcv, rcv = cost_volume_pair(
            s.pop("features_left"), s.pop("features_right"), ndisp,
            method=method, dtype=vdtype,
        )
        s["left_volume"], s["right_volume"] = lcv, rcv
        return s

    def make_cbca(iterations):
        def stage(s):
            s = dict(s)
            arms_l = compute_arms(s["left"], config.cbca_intensity, distance)
            arms_r = compute_arms(s["right"], config.cbca_intensity, distance)
            s["left_volume"] = run_cbca(s["left_volume"], arms_l, iterations)
            s["right_volume"] = run_cbca(s["right_volume"], arms_r, iterations)
            return s

        return stage

    def sgm_stage(s):
        s = dict(s)
        s["left_volume"] = _sgm_one_volume(
            s["left_volume"], s["left"], s["right"], "L", ndisp, config)
        s["right_volume"] = _sgm_one_volume(
            s["right_volume"], s["left"], s["right"], "R", ndisp, config)
        return s

    def wta(s):
        s = dict(s)
        s["left_disparity"] = wta_disparity(s["left_volume"])
        s["right_disparity"] = wta_disparity(s.pop("right_volume"))
        return s

    def interpolation(s):
        s = dict(s)
        s["disparity"] = lr_consistency_interpolate(
            s.pop("left_disparity"), s.pop("right_disparity"), ndisp)
        return s

    def subpixel(s):
        s = dict(s)
        s["disparity"] = subpixel_enhance(
            s["disparity"], s.pop("left_volume"), ndisp)
        return s

    def median(s):
        s = dict(s)
        s["disparity"] = median_filter(
            s["disparity"], config.median_filter_size,
            config.median_filter_size)
        return s

    def bilateral(s):
        s = dict(s)
        s["disparity"] = bilateral_filter(
            s["left"], s["disparity"], config.bilateral_filter_size,
            config.bilateral_filter_size, 0.0, config.blur_sigma,
            config.blur_threshold)
        return s

    stages = [
        ("features", features),
        ("cost_volume", cost_volume),
        ("cbca_1", make_cbca(config.cbca_num_iterations_1)),
        ("sgm", sgm_stage),
        ("cbca_2", make_cbca(config.cbca_num_iterations_2)),
        ("wta", wta),
        ("lr_interpolation", interpolation),
        ("subpixel", subpixel),
        ("median", median),
        ("bilateral", bilateral),
    ]
    return [(name, jax.jit(fn)) for name, fn in stages]


class MatchPipeline:
    """Host-facing wrapper: caches one compiled program per shape bucket.

    Per-image (H, W, ndisp) vary across a dataset; recompiling per image
    would reintroduce the reference's per-image graph-rebuild cost in
    XLA form. Images are padded up to (H, W) buckets (multiples of
    ``bucket``) and ndisp to a lane multiple; outputs are cropped back.
    """

    def __init__(
        self,
        params: Params,
        config: MatchConfig = MatchConfig(),
        cost_volume_method: str = "auto",
        bucket: int = 64,
        cbca_impl: str = "auto",
        volume_dtype: str = "float32",
        cbca_chunk_d: int = 0,
    ):
        self.params = jax.tree.map(jnp.asarray, params)
        self.config = config
        self.cost_volume_method = cost_volume_method
        self.cbca_impl = cbca_impl
        self.bucket = bucket
        self.volume_dtype = volume_dtype
        self.cbca_chunk_d = cbca_chunk_d
        self._compiled: Dict[Tuple[int, int, int], object] = {}

    def _get_fn(self, height: int, width: int, ndisp: int):
        key = (height, width, ndisp)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda p, l, r: match_pair(
                    p, l, r, ndisp, self.config, self.cost_volume_method,
                    cbca_impl=self.cbca_impl,
                    volume_dtype=self.volume_dtype,
                    cbca_chunk_d=self.cbca_chunk_d,
                )
            )
        return self._compiled[key]

    def _bucketed(self, size: int) -> int:
        return -(-size // self.bucket) * self.bucket

    def dispatch(self, left_image: np.ndarray, right_image: np.ndarray,
                 ndisp: int):
        """Async half of ``__call__``: pad, enqueue the compiled program,
        return an opaque handle WITHOUT syncing the device.

        Pair with ``fetch`` — the serve loop (cli/serve.py) dispatches
        scene N, then writes scene N-1's artifacts and loads scene N+1
        while N's device program runs.
        """
        height, width = left_image.shape
        pad_h = self._bucketed(height) - height
        pad_w = self._bucketed(width) - width
        if pad_h or pad_w:
            # edge-replicate padding keeps CBCA arms/SGM penalties sane at
            # the seam; the padded band is cropped from the output
            left = np.pad(left_image, ((0, pad_h), (0, pad_w)), mode="edge")
            right = np.pad(right_image, ((0, pad_h), (0, pad_w)), mode="edge")
        else:
            left, right = left_image, right_image
        fn = self._get_fn(left.shape[0], left.shape[1], ndisp)
        out = fn(self.params, jnp.asarray(left), jnp.asarray(right))
        return out, (height, width)

    @staticmethod
    def fetch(handle) -> np.ndarray:
        """Sync half of ``__call__``: block on the device result, crop."""
        out, (height, width) = handle
        return np.asarray(out)[:height, :width]

    def __call__(self, left_image: np.ndarray, right_image: np.ndarray,
                 ndisp: int) -> np.ndarray:
        """Standardized (H, W) pair -> (H, W) disparity (host arrays)."""
        return self.fetch(self.dispatch(left_image, right_image, ndisp))

    def stage_times(self, left_image: np.ndarray, right_image: np.ndarray,
                    ndisp: int):
        """Observability mode (cli/match.py --stage_times): run the
        pipeline as ten stage-isolated programs with a host sync after
        each, returning ``(disparity, {stage: seconds})``.

        Mirrors the reference's per-stage wall-clock prints
        (reference: src/match.py:126-176). Real data flows stage to stage
        (not isolated probes), but cross-stage fusion, buffer donation and
        the sequential-volume schedule are lost — expect it slower than
        ``__call__`` and avoid at full-res (both volumes live at once).
        """
        import time as _time

        height, width = left_image.shape
        pad_h = self._bucketed(height) - height
        pad_w = self._bucketed(width) - width
        if pad_h or pad_w:
            left = np.pad(left_image, ((0, pad_h), (0, pad_w)), mode="edge")
            right = np.pad(right_image, ((0, pad_h), (0, pad_w)), mode="edge")
        else:
            left, right = left_image, right_image
        key = ("staged", left.shape[0], left.shape[1], ndisp)
        if key not in self._compiled:
            self._compiled[key] = _build_staged(
                self.config, ndisp, self.cost_volume_method, self.cbca_impl,
                self.volume_dtype, self.cbca_chunk_d,
            )
        stages = self._compiled[key]

        state = {
            "params": self.params,
            "left": jnp.asarray(left),
            "right": jnp.asarray(right),
        }
        times = {}
        for name, fn in stages:
            t0 = _time.time()
            state = fn(state)
            # block_until_ready is a no-op on the tunneled platform; a
            # scalar fetch of one output leaf is the reliable sync
            leaf = state["disparity"] if "disparity" in state else (
                state.get("left_volume", state.get("features_left"))
            )
            np.asarray(jnp.sum(leaf.astype(jnp.float32)))
            times[name] = _time.time() - t0
        disparity = np.asarray(state["disparity"])[:height, :width]
        return disparity, times
