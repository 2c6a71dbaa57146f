"""Pallas TPU kernel: one SGM directional DP sweep.

Alternative to the lax.scan sweep in ops/sgm.py (reference semantics:
src/process_functional.py:476-568 — the min-normalized recurrence,
adaptive P1/P2 penalties, first line in sweep order kept). The volume
streams through VMEM with double-buffered chunk DMAs that overlap the
sequential DP, eliminating the XLA scan's per-step slice round trips.

MEASURED OUTCOME (v5e, half-res 1000x1504x256 bf16, tools/bench_sgm.py
IMPLS=pallas): 15.4 ms/sweep vs the XLA scan's 14.7 — the sweep is
VPU-THROUGHPUT bound, not overhead bound. The DP costs ~25 vector passes
per element per line (penalty decode, lane rolls, min reduce, three
mins, the normalize) and at ~1 (8,128) port that is ~3.4 us per
(512, 256) line — the XLA scan is already at that roofline, and this
kernel's u8 penalty decode costs about what the scan's slice overhead
does. Kept as a tested alternative and a negative result the next
optimizer should read before re-attempting; ops/sgm.py stays the
pipeline default.

Layout: the sweep always runs along dim 0 of a (S, P, D) volume (callers
transpose horizontal sweeps to (W, H, D) exactly as ops/sgm.py does). The
adaptive-penalty state is ONE uint8 volume (values 0/1/2 = scale
1, 1/Q1, 1/Q2) precomputed at XLA level by ``penalty_scale_u8`` — it
fuses the reference's D1/D2 gradient tests (b1, b2) into the only
quantity the DP needs, at 1 byte instead of two bool probes.

Structural notes (Mosaic constraints, see CLAUDE.md):
  * The chunk loop is a lax.fori_loop over chunk PAIRS: DMA buffer slots
    must be static (a traced ``.at[slot]`` hangs the compiler), so each
    iteration processes chunk 2c (slot 0) and 2c+1 (slot 1) with
    literal slot indices; chunk *offsets* are traced (dim-0 offsets of
    rank-3 refs carry no alignment constraint, so backward sweeps index
    freely).
  * Lines within a chunk run in an inner lax.fori_loop with the DP line
    as the carry — an unrolled 8-line chain stack-allocates every
    (TP, D) f32 temporary for the whole kernel and blows the VMEM stack.
  * ``prev`` is initialized to BIG_COST: with an all-BIG previous line
    the recurrence reduces to ``new = cur + BIG - BIG = cur`` exactly,
    which implements "the first line in sweep order is never updated"
    with no special case, and makes BIG-padded S lines (for chunk
    divisibility) exact pass-throughs.
  * d±1 neighbors are uniform lane rolls with the wrapped lane forced to
    BIG (the disparity-edge boundary case); the BIG disparity-pad lanes
    of the volume keep pad costs at ~BIG through the sweep, exactly like
    the XLA sweep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mccnn_tpu.ops.common import BIG_COST


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _dp_chunk(cur_ref, sc_ref, out_ref, prev_ref, *, chunk, forward,
              p1_base, p2_base, inv_q1, inv_q2):
    """Run the DP over one (chunk, TP, D) block resident in VMEM."""
    d_lanes = cur_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, prev_ref.shape, 1)
    first = lane == 0
    last = lane == d_lanes - 1

    def line(i, prev):
        k = i if forward else chunk - 1 - i
        cur = cur_ref[k].astype(jnp.float32)
        # u8 -> i32 -> f32-mask blend: Mosaic has no u8 -> f32 cast, and
        # i1 masks from u8-vs-scalar compares hit a relayout bug — i32
        # compares folded through f32 0/1 masks are the proven pattern
        # (ops/cbca_fused.py builds all its masks this way)
        code = sc_ref[k].astype(jnp.int32)
        m0 = (code == 0).astype(jnp.float32)
        m1 = (code == 1).astype(jnp.float32)
        scale = m0 + m1 * inv_q1 + (1.0 - m0 - m1) * inv_q2
        p1 = p1_base * scale
        p2 = p2_base * scale
        min_prev = jnp.min(prev, axis=1, keepdims=True)
        from_below = jnp.where(first, BIG_COST, pltpu.roll(prev, 1, 1))
        from_above = jnp.where(
            last, BIG_COST, pltpu.roll(prev, d_lanes - 1, 1)
        )
        candidate = jnp.minimum(
            jnp.minimum(prev, from_below + p1),
            jnp.minimum(from_above + p1, min_prev + p2),
        )
        # PARENTHESIZATION IS LOAD-BEARING: on seed/BIG-padded lines both
        # candidate and min_prev are exactly BIG_COST, so (candidate -
        # min_prev) is exactly 0 and the line passes through unchanged.
        # The XLA sweep's (cur + candidate) - min_prev order would round
        # cur onto BIG's 64-wide f32 ulp grid there.
        new = cur + (candidate - min_prev)
        out_ref[k] = new.astype(out_ref.dtype)
        return new

    prev_ref[...] = lax.fori_loop(0, chunk, line, prev_ref[...])


def _sweep_kernel(
    vol_hbm,   # (Sp, Pp, D) volume, ANY/HBM
    sc_hbm,    # (Sp, Pp, D) uint8 penalty scale codes, ANY/HBM
    out_hbm,   # (Sp, Pp, D) output, ANY/HBM
    cur_buf,   # VMEM (2, chunk, TP, D), volume dtype
    sc_buf,    # VMEM (2, chunk, TP, D), uint8
    out_buf,   # VMEM (2, chunk, TP, D), volume dtype
    prev_ref,  # VMEM (TP, D) f32 — the DP carry across chunks
    in_sems,   # DMA (2, 2)
    out_sems,  # DMA (2,)
    *,
    chunk: int,
    tile_p: int,
    size: int,
    n_chunks: int,
    forward: bool,
    p1_base: float,
    p2_base: float,
    inv_q1: float,
    inv_q2: float,
):
    j = pl.program_id(0)
    p0 = j * tile_p

    def lo(c):
        return c * chunk if forward else size - (c + 1) * chunk

    def in_dma(slot, c):
        return [
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(lo(c), chunk), pl.ds(p0, tile_p), :],
                cur_buf.at[slot], in_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(lo(c), chunk), pl.ds(p0, tile_p), :],
                sc_buf.at[slot], in_sems.at[slot, 1],
            ),
        ]

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[pl.ds(lo(c), chunk), pl.ds(p0, tile_p), :],
            out_sems.at[slot],
        )

    prev_ref[...] = jnp.full(prev_ref.shape, BIG_COST, jnp.float32)
    for copy in in_dma(0, 0):
        copy.start()

    @pl.when(n_chunks > 1)
    def _():
        for copy in in_dma(1, 1):
            copy.start()

    dp = functools.partial(
        _dp_chunk, chunk=chunk, forward=forward, p1_base=p1_base,
        p2_base=p2_base, inv_q1=inv_q1, inv_q2=inv_q2,
    )

    def do_chunk(slot, c):
        """Wait slot's input, DP it, ship it out, prefetch c + 2."""
        for copy in in_dma(slot, c):
            copy.wait()
        # the out buffer drains before rewrite: its previous DMA (chunk
        # c - 2) must have completed
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        dp(cur_buf.at[slot], sc_buf.at[slot], out_buf.at[slot], prev_ref)
        out_dma(slot, c).start()

        @pl.when(c + 2 < n_chunks)
        def _():
            for copy in in_dma(slot, c + 2):
                copy.start()

    def pair(c2, carry):
        do_chunk(0, 2 * c2)

        @pl.when(2 * c2 + 1 < n_chunks)
        def _():
            do_chunk(1, 2 * c2 + 1)

        return carry

    lax.fori_loop(0, (n_chunks + 1) // 2, pair, 0)

    # drain the tail out-DMAs
    @pl.when(n_chunks >= 2)
    def _():
        out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()


def sweep_pallas(
    volume: jax.Array,
    scale_u8: jax.Array,
    forward: bool,
    p1_base: float,
    p2_base: float,
    q1: float,
    q2: float,
    chunk: int = 8,
    tile_p: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """One DP sweep along dim 0 of ``volume`` given penalty scale codes.

    ``scale_u8[s, p, d]`` in {0, 1, 2} selects the penalty scale
    {1, 1/q1, 1/q2} (see ``penalty_scale_u8``). Both arrays are padded
    here to (S mult of chunk, P mult of tile_p); BIG_COST volume padding
    makes padded lines exact pass-throughs (module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    size, perp, d_lanes = volume.shape
    if d_lanes % 128:
        raise ValueError("the disparity axis must be padded to 128 lanes")
    if tile_p is None:
        # bound the inner-loop (TP, D) f32 temporaries to ~0.5 MB
        tile_p = 512 if d_lanes <= 256 else 256
    tile_p = min(tile_p, _round_up(perp, 8))  # small images: one P tile
    sp = _round_up(size, chunk)
    pp = _round_up(perp, tile_p)
    if sp != size or pp != perp:
        volume = jnp.pad(
            volume, ((0, sp - size), (0, pp - perp), (0, 0)),
            constant_values=jnp.asarray(BIG_COST, volume.dtype),
        )
        scale_u8 = jnp.pad(
            scale_u8, ((0, sp - size), (0, pp - perp), (0, 0))
        )
    n_chunks = sp // chunk

    kernel = functools.partial(
        _sweep_kernel,
        chunk=chunk, tile_p=tile_p, size=sp, n_chunks=n_chunks,
        forward=forward, p1_base=float(p1_base), p2_base=float(p2_base),
        inv_q1=1.0 / float(q1), inv_q2=1.0 / float(q2),
    )
    out = pl.pallas_call(
        kernel,
        grid=(pp // tile_p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((sp, pp, d_lanes), volume.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, tile_p, d_lanes), volume.dtype),
            pltpu.VMEM((2, chunk, tile_p, d_lanes), jnp.uint8),
            pltpu.VMEM((2, chunk, tile_p, d_lanes), volume.dtype),
            pltpu.VMEM((tile_p, d_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(volume, scale_u8)
    return out[:size, :perp, :]


def penalty_scale_u8(
    left_image: jax.Array,
    right_image: jax.Array,
    choice: str,
    direction: Tuple[int, int],
    d_pad: int,
    sgm_d: float,
) -> jax.Array:
    """(S, P, D) uint8 penalty codes for one sweep direction.

    Code 0 where both gradient tests pass (b1 & b2 — full P1/P2), 2
    where both fail (~b1 & ~b2 — divide by Q2), 1 otherwise (divide by
    Q1); the exact predicate of ops/sgm.py::_sweep (reference:
    src/process_functional.py:497-540). Horizontal sweeps emit (W, H, D)
    — the sweep-axis-leading layout of the transposed volume the
    horizontal DP runs on; vertical sweeps emit (H, W, D).

    D2 (the other image's disparity-shifted gradient probe) is built
    gather-free for horizontal sweeps via ``conv_general_dilated_patches``
    (D-wide sliding windows are pure data movement; the per-element
    ``jnp.take`` equivalent serializes on TPU) and with the one
    constant-index row gather for vertical sweeps (same construction the
    XLA sweep uses — measured faster than patches there because the
    banded (w - d) pattern has no contiguous-window structure).
    """
    rh, rw = direction
    vertical = rh != 0
    self_image = left_image if choice == "L" else right_image
    other_image = right_image if choice == "L" else left_image
    height, width = left_image.shape

    grad_self = jnp.abs(
        self_image - jnp.roll(jnp.roll(self_image, rh, 0), rw, 1)
    )
    b1 = grad_self < sgm_d  # (H, W)
    grad_other = jnp.abs(
        other_image - jnp.roll(jnp.roll(other_image, rh, 0), rw, 1)
    )
    small_other = grad_other < sgm_d
    oor_lo = max(0, rw)
    oor_hi = width + min(0, rw)
    disps = jnp.arange(d_pad, dtype=jnp.int32)

    if vertical:
        cols = jnp.arange(width, dtype=jnp.int32)[:, None]
        if choice == "L":
            probe = cols - disps[None, :]
            oor = probe < oor_lo
        else:
            probe = cols + disps[None, :]
            oor = probe >= oor_hi
        idx = jnp.clip(probe, 0, width - 1)
        b2 = jnp.where(oor[None], True, jnp.take(small_other, idx, axis=1))
        b1v = b1[:, :, None]
        return jnp.where(
            b1v & b2, jnp.uint8(0),
            jnp.where(~b1v & ~b2, jnp.uint8(2), jnp.uint8(1)),
        )

    # horizontal: (W, H, D). pat[h, d, x] = rows[h, x + d] via patches.
    if choice == "L":
        gpad = jnp.pad(grad_other[:, ::-1], ((0, 0), (0, d_pad)))
    else:
        gpad = jnp.pad(grad_other, ((0, 0), (0, d_pad)))
    pat = lax.conv_general_dilated_patches(
        gpad[:, None, :], filter_shape=(d_pad,), window_strides=(1,),
        padding="VALID",
    )[:, :, :width]  # (H, D, W)
    b2_hdw = pat < sgm_d
    if choice == "L":
        # pat[h, d, x] = gflip[h, x+d] = g[h, (W-1-x) - d]; column w sits
        # at x = W-1-w
        b2_hdw = b2_hdw[:, :, ::-1]
    b2 = jnp.transpose(b2_hdw, (2, 0, 1))  # (W, H, D)
    if choice == "L":
        oor = (jnp.arange(width, dtype=jnp.int32)[:, None] - disps[None, :]
               < oor_lo)
    else:
        oor = (jnp.arange(width, dtype=jnp.int32)[:, None] + disps[None, :]
               >= oor_hi)
    b2 = jnp.where(oor[:, None, :], True, b2)
    b1h = b1.T[:, :, None]  # (W, H, 1)
    return jnp.where(
        b1h & b2, jnp.uint8(0),
        jnp.where(~b1h & ~b2, jnp.uint8(2), jnp.uint8(1)),
    )


def sgm_pallas_one_volume(
    volume: jax.Array,
    left_image: jax.Array,
    right_image: jax.Array,
    choice: str,
    ndisp: int,
    config,
) -> jax.Array:
    """4-direction SGM for one volume with the Pallas DP sweep kernel.

    Chained in-place order (the reference aliasing quirk) by default;
    ``config.sgm_paper_mode`` averages independent sweeps, exactly like
    ops/sgm.py::_sgm_one_volume. Horizontal sweeps run on the (W, H, D)
    transpose with the sweep-axis dim 0, like the XLA path (adjacent
    transposes cancel at XLA level).
    """
    del ndisp  # semantics live in the BIG_COST disparity padding
    from mccnn_tpu.ops.sgm import _DIRECTIONS

    d_pad = volume.shape[2]

    def one(vol, direction):
        rh, rw = direction
        vertical = rh != 0
        p1 = config.sgm_p1 / config.sgm_v if vertical else config.sgm_p1
        scale = penalty_scale_u8(
            left_image, right_image, choice, direction, d_pad, config.sgm_d
        )
        forward = (rh == 1) if vertical else (rw == 1)
        if vertical:
            return sweep_pallas(
                vol, scale, forward, p1, config.sgm_p2,
                config.sgm_q1, config.sgm_q2,
            )
        out = sweep_pallas(
            vol.swapaxes(0, 1), scale, forward, p1, config.sgm_p2,
            config.sgm_q1, config.sgm_q2,
        )
        return out.swapaxes(0, 1)

    if config.sgm_paper_mode:
        swept = [one(volume, d) for d in _DIRECTIONS]
        return (swept[0] + swept[1] + swept[2] + swept[3]) / 4.0
    for direction in _DIRECTIONS:
        volume = one(volume, direction)
    return volume
