"""Semi-global matching (SGM), 4 axis-aligned directions.

Behavioral spec (reference: src/process_functional.py:187-235,476-568):
  * Per direction r in {right, left, up, down}, a DP sweep with the
    min-normalized recurrence
      L(d,p) = C(d,p) + min(L(d,p-r), L(d+-1,p-r)+P1, min_d' L(d',p-r)+P2)
                      - min_d' L(d',p-r)
    where the boundary d+-1 terms are omitted at the disparity edges and the
    first line in the sweep direction is never updated.
  * Adaptive penalties: P1/P2 are divided by Q2 where both image-gradient
    tests D1 (own image) and D2 (other image, disparity-shifted) are >= D,
    by Q1 where exactly one is, and kept where both are < D. Vertical sweeps
    use P1/V. Out-of-range D2 probes count as 0 (i.e. "< D").
  * CRITICAL reference quirk, reproduced as the default mode: the four
    directional sweeps alias one buffer (``cost_volume_rd = cost_volume`` at
    reference: src/process_functional.py:544 is not a copy), so they run
    *sequentially in place* and the final "average" at :210 averages four
    references to the same array. ``paper_mode=True`` instead gives the
    paper's independent-direction average.

TPU design: each sweep is a ``lax.scan`` along the sweep axis whose carry is
the whole volume, updated one chunk of lines per step (XLA keeps the carried
volume in place). The previous line's min-over-d is a lane reduction; d+-1
neighbors are lane shifts filled with BIG_COST, which implements the
disparity-edge boundary cases for free given the BIG_COST disparity padding.

Every sweep scans DIM 0 of its operand: horizontal sweeps transpose the
volume to (W, H, D) first and transpose back after. Measured on v5e at
half-res, a dim-1 scan (carry updated via a middle-axis dynamic_update_slice
XLA cannot alias in place — it recopies the whole ~1.5 GB carry every step)
ran 911 ms/sweep; the transposed dim-0 scan, both transposes included, runs
31.6 ms (29x).

The D2 penalty test never materializes an (H, W, D) *float* probe tensor
(an earlier version gathered it up front in f32; that one gather was an
11.75 GB allocation and the single biggest obstacle to fitting the ~6 MP /
ndisp-400 problem in one chip's HBM). Horizontal sweeps build it per scan
chunk from static window slices of the other image's gradient — always
cheap. Vertical sweeps need a banded (w - d) probe with no
contiguous-window structure; the full BOOL volume IS materialized whenever
it fits (under ``_B2_MATERIALIZE_LIMIT`` elements, 1 byte each — which
covers full-res, a 3.1 GB bool: even there the one constant-index gather
+ in-scan slicing is 7x faster than any per-chunk construction, 99.5
ms/sweep vs 682 conv-patches / 905 per-chunk gather). Only beyond that
limit do the chunks come from D-wide sliding windows via
``conv_general_dilated_patches`` (pure data movement).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mccnn_tpu.ops.common import BIG_COST
from mccnn_tpu.utils.config import MatchConfig

# sweep order matters in the reference-faithful chained mode
# (reference: src/process_functional.py:192-210): right, left, up, down
_DIRECTIONS = ((0, 1), (0, -1), (-1, 0), (1, 0))

# materialize the vertical-sweep D2 bool volume when it has at most this
# many elements (1 byte each); above it, build it per scan chunk instead.
# Covers full-res (2000x3072x512 = 3.15G, a 3.1 GB bool): even there the
# one big constant-index gather + in-scan slicing is 7x faster than any
# per-chunk construction (99.5 ms/sweep vs 682 conv-patches / 905 gather),
# and the sequential-volume schedule has the headroom for it.
_B2_MATERIALIZE_LIMIT = 4_000_000_000


def sgm(
    left_volume: jax.Array,
    right_volume: jax.Array,
    left_image: jax.Array,
    right_image: jax.Array,
    ndisp: int,
    config: MatchConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Apply 4-direction SGM to both (H, W, D) cost volumes."""
    left_out = _sgm_one_volume(
        left_volume, left_image, right_image, "L", ndisp, config
    )
    right_out = _sgm_one_volume(
        right_volume, left_image, right_image, "R", ndisp, config
    )
    return left_out, right_out


def _sgm_one_volume(
    volume: jax.Array,
    left_image: jax.Array,
    right_image: jax.Array,
    choice: str,
    ndisp: int,
    config: MatchConfig,
) -> jax.Array:
    cache: dict = {}  # shares the vertical D2 volume between up and down
    if config.sgm_paper_mode:
        swept = [
            _directional_sweep(
                volume, left_image, right_image, choice, d, ndisp, config,
                cache,
            )
            for d in _DIRECTIONS
        ]
        return (swept[0] + swept[1] + swept[2] + swept[3]) / 4.0
    # reference-faithful: chained in-place sweeps (the aliasing quirk)
    for direction in _DIRECTIONS:
        volume = _directional_sweep(
            volume, left_image, right_image, choice, direction, ndisp,
            config, cache,
        )
    return volume


def _directional_sweep(
    volume: jax.Array,
    left_image: jax.Array,
    right_image: jax.Array,
    choice: str,
    direction: Tuple[int, int],
    ndisp: int,
    config: MatchConfig,
    cache: dict | None = None,
) -> jax.Array:
    rh, rw = direction
    vertical = rh != 0
    p1_base = config.sgm_p1 / config.sgm_v if vertical else config.sgm_p1
    p2_base = config.sgm_p2
    forward = (rh == 1) if vertical else (rw == 1)

    if getattr(config, "sgm_u8", False):
        # One precomputed uint8 code volume (0/1/2 = scale 1, 1/Q1, 1/Q2)
        # replaces the per-line b1/b2 slices and the in-scan where-chain
        # (same predicate — see ops/sgm_pallas.penalty_scale_u8). Measured
        # on v5e at half-res: NO WIN (see the negative-result note at
        # _sweep's scale_chunk parameter); kept as a tested knob.
        from mccnn_tpu.ops.sgm_pallas import penalty_scale_u8

        codes = penalty_scale_u8(
            left_image, right_image, choice, direction, volume.shape[2],
            config.sgm_d,
        )

        def scale_chunk(start, length, _c=codes):
            return lax.dynamic_slice_in_dim(_c, start, length, axis=0)

        if vertical:
            return _sweep(
                volume, None, None, p1_base, p2_base, config, forward,
                scale_chunk=scale_chunk,
            )
        out = _sweep(
            volume.swapaxes(0, 1), None, None, p1_base, p2_base, config,
            forward, scale_chunk=scale_chunk,
        )
        return out.swapaxes(0, 1)

    small_d1, b2_chunk = _penalty_bits(
        left_image, right_image, choice, direction, volume.shape[2],
        config.sgm_d, cache,
    )
    if vertical:
        return _sweep(
            volume, small_d1, b2_chunk, p1_base, p2_base, config, forward
        )
    # horizontal: scan dim 0 of the (W, H, D) transpose — see module
    # docstring for why a middle-axis scan is 29x slower. Adjacent sweeps
    # in the chained mode transpose back and forth; XLA cancels the pair.
    out = _sweep(
        volume.swapaxes(0, 1), small_d1.T, b2_chunk, p1_base, p2_base,
        config, forward,
    )
    return out.swapaxes(0, 1)


def _penalty_bits(
    left_image: jax.Array,
    right_image: jax.Array,
    choice: str,
    direction: Tuple[int, int],
    d_pad: int,
    sgm_d: float,
    cache: dict | None = None,
):
    """(D1 < sgm_d) plane and a per-chunk (D2 < sgm_d) builder.

    D1(h,w) = |I_self(h,w) - I_self(h-rh, w-rw)|.
    D2(d,h,w) probes the *other* image's directional gradient at the
    disparity-shifted column (w-d for the left volume, w+d for the right),
    with out-of-range probes counting as 0 (reference skips them, leaving
    the zero initialization, reference: src/process_functional.py:507-533).

    Returns ``(small_d1, b2_chunk)`` where ``b2_chunk(start, length)``
    yields the (length, perp, D) block of (D2 < sgm_d) bits for scan lines
    [start, start+length) along the sweep axis — lines are columns for
    horizontal sweeps (perp = H) and rows for vertical ones (perp = W).
    Horizontal sweeps never materialize anything of size (H, W, D);
    vertical sweeps materialize the full (W, H, D) BOOL volume up front
    when it fits ``_B2_MATERIALIZE_LIMIT`` (including full-res — see the
    module docstring) and fall back to conv-patches chunks beyond it.
    """
    rh, rw = direction
    vertical = rh != 0
    self_image = left_image if choice == "L" else right_image
    other_image = right_image if choice == "L" else left_image
    height, width = left_image.shape

    grad_self = jnp.abs(self_image - jnp.roll(jnp.roll(self_image, rh, 0), rw, 1))
    small_d1 = grad_self < sgm_d

    grad_other = jnp.abs(
        other_image - jnp.roll(jnp.roll(other_image, rh, 0), rw, 1)
    )
    # every non-out-of-range probe w -+ d lies in [0, W); pad reads only
    # ever land on positions the oor mask overwrites with True
    oor_lo = max(0, rw)  # left volume: probe < oor_lo is out of range
    oor_hi = width + min(0, rw)  # right volume: probe >= oor_hi is oor
    disps = jnp.arange(d_pad, dtype=jnp.int32)

    if not vertical:
        # lines are columns; line w needs grad at columns w-d (L) or w+d
        # (R) for d in [0, D): static slices of one padded window fetched
        # with a single dynamic slice per chunk. For L the gradient plane
        # is FLIPPED once outside the scan, turning the descending-d
        # window into an ascending contiguous slice (no in-scan lax.rev).
        if choice == "L":
            # gflip[h, x] = grad[h, W-1-x], padded by D on the right so
            # line w's slice base (W-1-w) + 0..D-1+len-1 stays in range
            gpad = jnp.pad(grad_other[:, ::-1], ((0, 0), (0, d_pad)))
        else:
            gpad = jnp.pad(grad_other, ((0, 0), (0, d_pad)))

        def b2_chunk(start, length):
            # L: line w = start+k, d -> gflip col (W-1-w) + d; the chunk
            #    window starts at the LAST line's base, static offsets
            #    (length-1-k) per line.
            # R: line w, d -> grad col w + d; window starts at `start`,
            #    static offsets k per line.
            base = (width - 1 - (start + length - 1)) if choice == "L" else start
            window = lax.dynamic_slice(
                gpad, (0, base), (height, d_pad - 1 + length)
            )
            small = window < sgm_d
            lines = []
            for k in range(length):
                local = (length - 1 - k) if choice == "L" else k
                block = lax.slice_in_dim(small, local, local + d_pad, axis=1)
                if choice == "L":
                    oor = (start + k) - disps < oor_lo
                else:
                    oor = (start + k) + disps >= oor_hi
                lines.append(jnp.where(oor[None, :], True, block))
            return jnp.stack(lines, axis=0)  # (length, H, D)

        return small_d1, b2_chunk

    # vertical: lines are rows; the (W, D) banded column-probe pattern is
    # the same for every row — one constant-index gather per chunk
    small_other = grad_other < sgm_d
    cols = jnp.arange(width, dtype=jnp.int32)[:, None]
    if choice == "L":
        probe = cols - disps[None, :]  # (W, D), constant
        oor = probe < oor_lo
    else:
        probe = cols + disps[None, :]
        oor = probe >= oor_hi
    idx = jnp.clip(probe, 0, width - 1)

    if height * width * d_pad <= _B2_MATERIALIZE_LIMIT:
        ck = ("b2v", choice)
        if cache is not None and ck in cache and cache[ck][0] == -rh:
            # The opposite vertical direction already gathered its D2
            # volume, and grad(rh) == roll(grad(-rh), rh, axis=0) exactly
            # (both are wrapped jnp.roll differences of the same image),
            # so this direction's bits are the cached volume shifted by rh
            # rows. Sweep chunks only ever cover interior lines (the seed
            # line is never updated), so start - rh stays in [0, H) and
            # the wrap row is never read — a plain shifted slice replaces
            # the 40+ ms serialized gather at full-res.
            prev_b2 = cache[ck][1]

            def b2_chunk(start, length, _b2=prev_b2, _rh=rh):
                return lax.dynamic_slice_in_dim(_b2, start - _rh, length,
                                                axis=0)

            return small_d1, b2_chunk
        # one full gather outside the scan (e.g. 385 MB bool at half-res)
        # is 4x faster than gathering per chunk inside it
        b2_full = jnp.where(oor[None], True, jnp.take(small_other, idx, axis=1))
        if cache is not None:
            cache[ck] = (rh, b2_full)

        def b2_chunk(start, length):
            return lax.dynamic_slice_in_dim(b2_full, start, length, axis=0)

        return small_d1, b2_chunk

    # full-res scale: build the banded probe per scan chunk from D-wide
    # sliding windows of the gradient rows via an identity-filter conv
    # (pure data movement). The per-chunk jnp.take gather it replaces
    # cost 905 ms/sweep at full-res (TPU serializes per-element gathers).
    # For L the rows are flipped so the descending-d band becomes an
    # ascending window: pat[i, d, x] = gflip[x + d] = grad[w - d] at
    # w = W-1-x; right-pad reads are zeros (-> True) and land exactly on
    # the out-of-range region the oor mask overwrites.
    if choice == "L":
        gpad = jnp.pad(grad_other[:, ::-1], ((0, 0), (0, d_pad)))
    else:
        gpad = jnp.pad(grad_other, ((0, 0), (0, d_pad)))

    def b2_chunk(start, length):
        rows = lax.dynamic_slice_in_dim(gpad, start, length, axis=0)
        pat = lax.conv_general_dilated_patches(
            rows[:, None, :], filter_shape=(d_pad,), window_strides=(1,),
            padding="VALID",
        )[:, :, :width]  # (length, D, W): pat[i, d, x] = rows[i, x + d]
        block = (pat < sgm_d).transpose(0, 2, 1)  # (length, W, D)
        if choice == "L":
            block = block[:, ::-1, :]
        return jnp.where(oor[None], True, block)

    return small_d1, b2_chunk


def _sweep(
    volume: jax.Array,
    small_d1: jax.Array,
    b2_chunk,
    p1_base: float,
    p2_base: float,
    config: MatchConfig,
    forward: bool,
    chunk: int | None = None,
    scale_chunk=None,
) -> jax.Array:
    """One DP sweep along dim 0 of ``volume`` (lines = dim-0 slices).

    The first line in sweep order is kept. The scan carries the whole
    volume plus the previous DP line and processes ``chunk`` lines per
    step with a static inner loop — one line per scan step leaves the
    device idle on while-loop bookkeeping (~30us/step); chunking
    amortizes it. Dim-0 updates are contiguous, which XLA aliases in
    place (callers transpose for horizontal sweeps — see module
    docstring). D2 penalty bits come from ``b2_chunk(start, length) ->
    (length, perp, D)``, built inside each step (see ``_penalty_bits``).

    ``scale_chunk`` (config.sgm_u8): slices of a precomputed uint8 code
    volume replace small_d1/b2_chunk; the scale is decoded in-scan with
    the arithmetically-identical compare/select chain. NEGATIVE RESULT
    (v5e, half-res 1000x1504x256 bf16, tools/bench_sgm.py IMPLS=u8): the
    decode costs the same ~4 VPU passes the b1/b2 where-chain does, and
    the code volume's production + HBM round-trip is pure overhead on
    top — the sweep stays VPU-throughput bound (~25 passes/element, same
    roofline the Pallas sweep hit; see ops/sgm_pallas.py).
    """
    if chunk is None:
        chunk = int(getattr(config, "sgm_chunk", 0))
    size = volume.shape[0]
    perp = volume.shape[1]
    if chunk == 0:
        # auto: per-step VPU work is chunk sequential DP lines whose f32
        # intermediates stack in VMEM. Chunk 16 wins at half-res line
        # sizes (14.7 vs 15.0 ms/sweep over chunk 8) but loses at full-res
        # width, where 16 f32 lines are ~100 MB of step temporaries
        # (measured 500x3072x512 bf16: chunk 8 = 25.0 ms/sweep, 16 = 27.0,
        # 4 = 25.5) — switch at a 32 MB chunk-16 line stack
        chunk = 16 if perp * volume.shape[2] <= 512 * 1024 else 8
    inv_q1 = 1.0 / config.sgm_q1
    inv_q2 = 1.0 / config.sgm_q2
    # DP math runs in f32 regardless of the volume storage dtype (bf16
    # volumes are the full-resolution memory mode); lines are cast back to
    # the storage dtype when written into the carried volume.
    big = jnp.full((perp, 1), BIG_COST, dtype=jnp.float32)

    def dp_line(prev, cur, b1, b2):
        cur = cur.astype(jnp.float32)
        if scale_chunk is not None:
            # b2 holds uint8 codes 0/1/2; identical truth table, decoded
            code = b2
            scale = jnp.where(
                code == 0, 1.0, jnp.where(code == 1, inv_q1, inv_q2)
            )
        else:
            # truth table: both tests small -> 1, exactly one -> 1/q1,
            # neither -> 1/q2 (reference: src/process_functional.py:497-541);
            # written with | so the "neither" test is one op, not ~&~
            scale = jnp.where(
                b1[:, None] & b2,
                1.0,
                jnp.where(b1[:, None] | b2, inv_q1, inv_q2),
            )
        p1 = p1_base * scale
        p2 = p2_base * scale
        min_prev = jnp.min(prev, axis=1, keepdims=True)
        from_below = jnp.concatenate([big, prev[:, :-1]], axis=1)  # L(d-1)
        from_above = jnp.concatenate([prev[:, 1:], big], axis=1)  # L(d+1)
        # min(a+p, b+p) == min(a,b)+p bit-exactly (rounding is monotone,
        # identical addend) — one add instead of two per element
        neighbor = jnp.minimum(from_below, from_above) + p1
        candidate = jnp.minimum(
            jnp.minimum(prev, neighbor), min_prev + p2
        )
        return cur + candidate - min_prev

    def step(carry, chunk_start):
        vol, prev = carry
        cur_block = lax.dynamic_slice_in_dim(vol, chunk_start, chunk, axis=0)
        if scale_chunk is not None:
            b1_block = None
            pen_block = scale_chunk(chunk_start, chunk)
        else:
            b1_block = lax.dynamic_slice_in_dim(small_d1, chunk_start, chunk,
                                                axis=0)
            pen_block = b2_chunk(chunk_start, chunk)
        lines = []
        for k in range(chunk):
            idx = k if forward else chunk - 1 - k
            prev = dp_line(
                prev, cur_block[idx],
                None if b1_block is None else b1_block[idx],
                pen_block[idx],
            )
            lines.append(prev)
        if not forward:
            lines = lines[::-1]
        new_block = jnp.stack(lines, axis=0).astype(vol.dtype)
        vol = lax.dynamic_update_slice_in_dim(vol, new_block, chunk_start,
                                              axis=0)
        return (vol, prev), None

    # the first line in sweep order is never updated; it seeds the carry
    interior = size - 1
    remainder = interior % chunk
    first = 0 if forward else size - 1
    prev = volume[first].astype(jnp.float32)

    # prologue: a few single-line static steps until the rest is chunkable
    prologue = (
        range(1, 1 + remainder)
        if forward
        else range(size - 2, size - 2 - remainder, -1)
    )
    for idx in prologue:
        if scale_chunk is not None:
            prev = dp_line(prev, volume[idx], None, scale_chunk(idx, 1)[0])
        else:
            prev = dp_line(
                prev, volume[idx], small_d1[idx], b2_chunk(idx, 1)[0]
            )
        volume = lax.dynamic_update_index_in_dim(
            volume, prev.astype(volume.dtype), idx, axis=0
        )

    num_chunks = interior // chunk
    if num_chunks == 0:
        return volume
    if forward:
        starts = jnp.arange(1 + remainder, size, chunk, dtype=jnp.int32)
    else:
        starts = jnp.arange(
            size - 2 - remainder - (chunk - 1), -1, -chunk, dtype=jnp.int32
        )
    (out, _), _ = lax.scan(step, (volume, prev), starts)
    return out
