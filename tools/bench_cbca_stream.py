"""Measure the DMA/HBM floor of the fused-CBCA tiling, compute removed.

The fused kernel (ops/cbca_fused.py) runs ~10.6 ms/round bf16 at half-res
against a ~6 ms theoretical HBM bound; ROADMAP attributes the gap to
"instruction issue/DMA latency" without a measurement. This tool streams
the volume through VMEM with EXACTLY the fused kernel's traffic pattern —
same spatial grid, same haloed window reads ((tile_h + 2*halo) x (tile_w +
2*halo) x tile_d, double-buffered sub-row strips), same tile writes, an
in-kernel d-chunk loop — but replaces both matmul phases with one slice
copy. The measured time is the achievable floor for ANY kernel with this
tiling; the fused kernel's distance above it is the price of its compute
(phases 1+2 + mask builds), and the floor's distance above bytes/360GBps
is the DMA-latency/issue overhead of the tiling itself.

Env: H, W, D, TILE_H, TILE_W, TILE_D, DTYPE (bf16|f32), ITERS,
LAYOUT (flat|dsplit).

LAYOUT=dsplit stores the volume as (D/tile_d, H, W, tile_d) — the d-chunk
axis major — so every window DMA reads a contiguous (span_w * tile_d)-
element run per row (~40 KB bf16) instead of a 256 B fiber per (row, col).
This measures whether the flat layout's small per-fiber contiguity is what
caps the floor at 237 GB/s; if the dsplit floor is materially lower, a
d-split volume layout between CBCA rounds is the next kernel lever.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HALO = 16


def _round_up(v, m):
    return -(-v // m) * m


def _stream_kernel(
    vol_hbm, out_hbm, win_ref, out_ref, win_sems, out_sems, *,
    tile_h, tile_w, tile_d, n_chunks, rows_total, cols_total, dsplit=False,
):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    halo = _HALO
    i = pl.program_id(0)
    j = pl.program_id(1)
    span_h = tile_h + 2 * halo
    span_w = tile_w + 2 * halo
    row_base = pl.multiple_of(
        jnp.minimum(jnp.maximum(i * tile_h - halo, 0), rows_total - span_h),
        16,
    )
    col_base = pl.multiple_of(
        jnp.minimum(jnp.maximum(j * tile_w - halo, 0), cols_total - span_w),
        16,
    )

    def win_dma(slot, k):
        src = (
            vol_hbm.at[
                k,
                pl.ds(row_base, span_h),
                pl.ds(col_base, span_w),
                :,
            ]
            if dsplit
            else vol_hbm.at[
                pl.ds(row_base, span_h),
                pl.ds(col_base, span_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ]
        )
        return pltpu.make_async_copy(src, win_ref.at[slot], win_sems.at[slot])

    def out_dma(slot, k):
        dst = (
            out_hbm.at[
                k,
                pl.ds(pl.multiple_of(i * tile_h, 16), tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                :,
            ]
            if dsplit
            else out_hbm.at[
                pl.ds(pl.multiple_of(i * tile_h, 16), tile_h),
                pl.ds(pl.multiple_of(j * tile_w, 128), tile_w),
                pl.ds(pl.multiple_of(k * tile_d, 128), tile_d),
            ]
        )
        return pltpu.make_async_copy(out_ref.at[slot], dst, out_sems.at[slot])

    win_dma(0, 0).start()
    ro = pl.multiple_of(i * tile_h - row_base, 16)
    co = pl.multiple_of(j * tile_w - col_base, 16)

    # global out-DMA counter: the rotating 2-slot out buffer is drained
    # with the current descriptor (semaphore counting — the exact pattern
    # ops/cbca_rolling.py documents), two transfers behind.
    g0 = (i * (cols_total // tile_w) + j) * n_chunks
    for k in range(n_chunks):  # static, small (D/tile_d)
        slot = k % 2
        if k + 1 < n_chunks:
            win_dma((k + 1) % 2, k + 1).start()
        win_dma(slot, k).wait()

        @pl.when(g0 + k >= 2)
        def _(slot=slot, k=k):
            out_dma(slot, k).wait()

        # slice the REF (dynamic_slice of a VMEM value has no TC lowering);
        # ro/co are 16-aligned (both terms are), d offset is static 0
        out_ref[slot] = win_ref[slot, pl.ds(ro, tile_h), pl.ds(co, tile_w), :]
        out_dma(slot, k).start()

    # last grid step: drain the tail transfers
    @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
    def _():
        for k in range(max(0, n_chunks - 2), n_chunks):
            out_dma(k % 2, k).wait()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    height = int(os.environ.get("H", "1000"))
    width = int(os.environ.get("W", "1504"))
    d_pad = int(os.environ.get("D", "256"))
    tile_h = int(os.environ.get("TILE_H", "64"))
    tile_w = int(os.environ.get("TILE_W", "128"))
    tile_d = int(os.environ.get("TILE_D", "128"))
    iters = int(os.environ.get("ITERS", "4"))
    # i8 probes the floor for an int8-storage CBCA (half the bytes of
    # bf16); the identity-copy semantics are dtype-agnostic
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32, "i8": jnp.int8}[
        os.environ.get("DTYPE", "bf16")]
    dsplit = os.environ.get("LAYOUT", "flat") == "dsplit"

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    n_chunks = d_pad // tile_d
    span_h, span_w = tile_h + 2 * _HALO, tile_w + 2 * _HALO
    vol_shape = (n_chunks, hp, wp, tile_d) if dsplit else (hp, wp, d_pad)

    kernel = functools.partial(
        _stream_kernel, tile_h=tile_h, tile_w=tile_w, tile_d=tile_d,
        n_chunks=n_chunks, rows_total=hp, cols_total=wp, dsplit=dsplit,
    )
    call = pl.pallas_call(
        kernel,
        grid=(hp // tile_h, wp // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(vol_shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((2, span_h, span_w, tile_d), dtype),
            pltpu.VMEM((2, tile_h, tile_w, tile_d), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )

    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        vol = jnp.asarray(
            rng.integers(-100, 100, size=vol_shape, dtype=np.int8)
        )
    else:
        vol = jnp.asarray(
            rng.normal(size=vol_shape).astype(np.float32)
        ).astype(dtype)

    def rounds(v):
        from jax import lax

        return lax.fori_loop(0, iters, lambda _, x: call(x), v)

    fn = jax.jit(rounds)
    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    out = fn(vol)
    got = np.asarray(sync(out))
    want = np.asarray(sync(vol))
    t0 = time.time()
    out = fn(vol)
    np.asarray(sync(out))
    per_round = (time.time() - t0) / iters * 1e3
    bytes_moved = hp * wp * d_pad * jnp.dtype(dtype).itemsize
    read_amp = (span_h / tile_h) * (span_w / tile_w)
    layout = "dsplit" if dsplit else "flat"
    print(f"stream-only round ({hp}x{wp}x{d_pad} {os.environ.get('DTYPE','bf16')} "
          f"{layout}, th{tile_h} tw{tile_w} td{tile_d}): {per_round:.2f} ms "
          f"(checksum ok={abs(got - want) < 1e-2 * abs(want) + 1}); "
          f"traffic {(1 + read_amp) * bytes_moved / 1e9:.2f} GB/round -> "
          f"{(1 + read_amp) * bytes_moved / per_round / 1e6:.0f} GB/s achieved",
          flush=True)


if __name__ == "__main__":
    main()
