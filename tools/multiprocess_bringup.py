"""Two-process ``jax.distributed`` bring-up on the CPU backend.

Closes the round-2 review gap "test_multihost covers only the strided
index math, not a two-process jax.distributed bring-up": this tool spawns
TWO real OS processes, brings up the distributed runtime (coordinator +
worker over gloo CPU collectives), builds a global 2-device mesh spanning
both processes, and runs

  1. a ``shard_map``/``psum`` reduction across processes (the raw
     collective path every multi-host program depends on), and
  2. one row-sharded CBCA round (``parallel/cbca.cbca_sharded``) whose
     ``ppermute`` halo exchange crosses the process boundary, compared
     exactly against the single-device stencil each process computes
     locally.

This is the DCN analogue of the reference's process-level ``--start/--end``
sharding (reference: src/match.py:26-28,83-91) upgraded to a shared device
mesh: the same ``jax.distributed.initialize`` wrapper
(``parallel/multihost.py``) used by ``cli/match.py --multihost``.

Run (single 1-core host — the two processes timeshare; tiny shapes):

    python tools/multiprocess_bringup.py

Prints ``BRINGUP OK`` from the parent when both children validate.
"""

from __future__ import annotations

import argparse
import functools
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    # sitecustomize pins the default platform to the tunneled TPU; force
    # the CPU backend BEFORE the distributed/backend bring-up
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    devices = jax.devices()
    assert len(devices) == num_processes, devices
    print(
        f"[p{process_id}] processes={jax.process_count()} "
        f"global_devices={[d.id for d in devices]} "
        f"local_devices={[d.id for d in jax.local_devices()]}",
        flush=True,
    )
    mesh = Mesh(np.array(devices), ("data",))

    # --- 1. cross-process psum ------------------------------------------
    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("data"), out_specs=P()
    )
    def total(x):
        return jax.lax.psum(jnp.sum(x), "data")

    contrib = np.arange(1, num_processes + 1, dtype=np.float32)
    glob = jax.device_put(contrib, NamedSharding(mesh, P("data")))
    got = float(np.asarray(total(glob)))
    expect = float(contrib.sum())
    assert got == expect, (got, expect)
    print(f"[p{process_id}] psum across processes: {got} == {expect}",
          flush=True)

    # --- 2. row-sharded CBCA round with cross-process ppermute halos ----
    from mccnn_tpu.ops.cbca import cbca, compute_arms
    from mccnn_tpu.parallel.cbca import cbca_sharded

    rng = np.random.default_rng(0)
    height, width, ndisp = 32, 40, 8  # shard height 16 >= radius 13
    image = rng.standard_normal((height, width)).astype(np.float32)
    volume = rng.standard_normal((height, width, ndisp)).astype(np.float32)
    arms = compute_arms(jnp.asarray(image), 0.4, 14)

    sharded = cbca_sharded(
        jnp.asarray(volume), arms, num_iterations=2,
        distance_threshold=14, mesh=mesh, axis="data",
    )
    reference = np.asarray(
        cbca(jnp.asarray(volume), arms, num_iterations=2,
             distance_threshold=14)
    )
    for shard in sharded.addressable_shards:
        local = np.asarray(shard.data)
        want = reference[shard.index]
        err = float(np.max(np.abs(local - want)))
        assert err == 0.0, err
        print(
            f"[p{process_id}] sharded CBCA shard rows {shard.index[0]} "
            f"exactly equal (max abs diff {err})",
            flush=True,
        )
    print(f"[p{process_id}] CHILD OK", flush=True)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--role", choices=["parent", "child"],
                        default="parent")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--timeout", type=float, default=600.0)
    args = parser.parse_args()

    if args.role == "child":
        _child(args.coordinator, args.num_processes, args.process_id)
        return 0

    coordinator = f"127.0.0.1:{_free_port()}"
    start = time.time()
    children = [
        subprocess.Popen(
            [
                sys.executable, __file__, "--role", "child",
                "--coordinator", coordinator,
                "--num-processes", str(args.num_processes),
                "--process-id", str(pid),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(args.num_processes)
    ]
    outputs, codes = [], []
    deadline = start + args.timeout
    for proc in children:
        try:
            out, _ = proc.communicate(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            out += "\n<parent timeout>"
        outputs.append(out)
        codes.append(proc.returncode)
    for pid, out in enumerate(outputs):
        sys.stdout.write(out)
    ok = all(code == 0 for code in codes) and all(
        "CHILD OK" in out for out in outputs
    )
    elapsed = time.time() - start
    print(f"exit codes: {codes}  elapsed: {elapsed:.1f}s")
    print("BRINGUP OK" if ok else "BRINGUP FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
