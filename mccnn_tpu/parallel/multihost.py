"""Multi-host image sharding — the descendant of ``--start/--end``.

The reference parallelizes matching by running disjoint image-index ranges
in separate processes (reference: src/match.py:26-28,83-91). On a
multi-host TPU slice the same contract maps to per-process scene subsets:
initialize the distributed runtime, and each host takes every
``process_count``-th scene. Outputs are per-scene files, so the scheme is
idempotent and crash-restartable at one-image granularity, exactly like
the reference's.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (DCN) when running multi-host."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_slice(
    num_scenes: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """Scene indices owned by this host (strided assignment)."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return list(range(process_index, num_scenes, process_count))


def shard_scenes(
    scenes: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[Tuple[int, str]]:
    """(index, scene) pairs owned by this host."""
    indices = process_slice(len(scenes), process_index, process_count)
    return [(i, scenes[i]) for i in indices]
