"""Multi-host scene-sharding assignment logic.

Scope note: these tests cover only the pure-Python strided-assignment
arithmetic. ``initialize_distributed`` (the ``jax.distributed.initialize``
wrapper in mccnn_tpu/parallel/multihost.py) cannot be exercised in this
single-host environment — no JAX multi-process runtime is spun up here,
so the DCN path is validated only by the thin-wrapper code review and by
the assignment contract below.
"""

from mccnn_tpu.parallel.multihost import process_slice, shard_scenes


def test_process_slice_partitions_exactly():
    all_indices = []
    for p in range(4):
        all_indices.extend(process_slice(10, process_index=p, process_count=4))
    assert sorted(all_indices) == list(range(10))


def test_shard_scenes_strided():
    scenes = [f"s{i}" for i in range(7)]
    owned = shard_scenes(scenes, process_index=1, process_count=3)
    assert owned == [(1, "s1"), (4, "s4")]
