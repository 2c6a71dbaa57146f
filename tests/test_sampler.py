import numpy as np
import pytest

from mccnn_tpu.data.dataset import StereoDataset, standardize
from mccnn_tpu.data.sampler import TripletSampler
from mccnn_tpu.io.pfm import write_pfm


def _write_dataset(tmp_path, rng, n_pairs=2, height=32, width=40):
    from PIL import Image

    list_path = tmp_path / "train.txt"
    lines = []
    for i in range(n_pairs):
        scene = tmp_path / f"scene{i}"
        scene.mkdir()
        for name in ("im0.png", "im1.png"):
            img = (rng.random((height, width)) * 255).astype(np.uint8)
            Image.fromarray(img, mode="L").save(scene / name)
        gt = rng.uniform(0, 12, size=(height, width)).astype(np.float32)
        gt[rng.random((height, width)) < 0.1] = np.inf  # unknown disparity
        write_pfm(gt, str(scene / "disp0GT.pfm"))
        lines.append(str(scene / "im0.png"))
    list_path.write_text("\n".join(lines) + "\n")
    return str(list_path)


def test_dataset_loads_and_standardizes(tmp_path, rng):
    list_file = _write_dataset(tmp_path, rng)
    ds = StereoDataset(list_file)
    assert len(ds) == 2
    left, right, gt = ds.get(0)
    assert left.shape == right.shape == gt.shape == (32, 40)
    np.testing.assert_allclose(left.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(left.std(), 1.0, atol=1e-4)


def test_shuffle_reorders_but_preserves_set(tmp_path, rng):
    list_file = _write_dataset(tmp_path, rng, n_pairs=5)
    ds = StereoDataset(list_file, shuffle=True, seed=3)
    firsts = {ds.get(i)[0].tobytes() for i in range(5)}
    ds.reshuffle()
    again = {ds.get(i)[0].tobytes() for i in range(5)}
    assert firsts == again


def test_next_batch_shapes_and_validity(tmp_path, rng):
    list_file = _write_dataset(tmp_path, rng)
    ds = StereoDataset(list_file)
    sampler = TripletSampler(ds, seed=0)
    left, pos, neg = sampler.next_batch(16)
    for t in (left, pos, neg):
        assert t.shape == (16, 11, 11, 1)
        assert t.dtype == np.float32
        assert np.isfinite(t).all()


def test_valid_anchor_constraints(tmp_path, rng):
    list_file = _write_dataset(tmp_path, rng)
    ds = StereoDataset(list_file)
    sampler = TripletSampler(ds, seed=0)
    _, _, gt = ds.get(0)
    rows = rng.integers(0, 32, size=64)
    cols = rng.integers(0, 40, size=64)
    rows, cols = sampler._valid_anchors(gt, rows, cols, 32, 40)
    assert np.isfinite(gt[rows, cols]).all()
    assert (gt[rows, cols].astype(np.int64) <= cols).all()


def test_jittered_columns_in_range(tmp_path, rng):
    # anchor validity guarantees base in [0, W) (int(gt) <= col, gt >= 0),
    # which is what makes the rejection loops terminate
    list_file = _write_dataset(tmp_path, rng)
    sampler = TripletSampler(StereoDataset(list_file), seed=0)
    base = rng.integers(0, 40, size=256)
    pos = sampler._jittered_columns(base, 40, -0.5, 0.5, False)
    assert ((pos >= 0) & (pos < 40)).all()
    assert (np.abs(pos - base) <= 1).all()
    neg = sampler._jittered_columns(base, 40, 1.5, 6.0, True)
    assert ((neg >= 0) & (neg < 40)).all()
    assert (np.abs(neg - base) >= 1).all()
    assert (np.abs(neg - base) <= 6).all()


def test_batch_too_large_raises(tmp_path, rng):
    list_file = _write_dataset(tmp_path, rng, height=16, width=40)
    sampler = TripletSampler(StereoDataset(list_file), seed=0)
    with pytest.raises(ValueError):
        sampler.next_batch(20)


def test_next_pair_sequential_and_reset(tmp_path, rng):
    import pytest

    list_file = _write_dataset(tmp_path, rng, n_pairs=3)
    dataset = StereoDataset(list_file)
    seen = [dataset.next_pair() for _ in range(3)]
    assert len(seen) == 3
    with pytest.raises(IndexError):
        dataset.next_pair()
    dataset.reshuffle()
    left, right, gt = dataset.next_pair()
    assert left.shape == right.shape
    assert gt.shape == left.shape


def test_prefetcher_stream_parity(tmp_path, rng):
    """The background prefetcher delivers the exact synchronous batch
    stream, including across epoch-boundary reshuffles."""
    from mccnn_tpu.data.prefetch import BatchPrefetcher

    list_file = _write_dataset(tmp_path, rng, n_pairs=3)
    epochs, epoch_len, batch_size = 2, 3, 8

    ds_sync = StereoDataset(list_file, shuffle=True, seed=7)
    sync_sampler = TripletSampler(ds_sync, seed=5)
    expected = []
    for _ in range(epochs):
        for _ in range(epoch_len):
            expected.append(sync_sampler.next_batch(batch_size))
        sync_sampler.reset()

    ds_pre = StereoDataset(list_file, shuffle=True, seed=7)
    pre_sampler = TripletSampler(ds_pre, seed=5)
    with BatchPrefetcher(pre_sampler, batch_size, epoch_len=epoch_len,
                         depth=2) as feed:
        got = []
        for _ in range(epochs):
            for _ in range(epoch_len):
                got.append(feed.next_batch(batch_size))
            feed.reset()

    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        for ga, ea in zip(g, e):
            np.testing.assert_array_equal(ga, ea)


def test_prefetcher_rejects_early_reset_and_wrong_batch(tmp_path, rng):
    from mccnn_tpu.data.prefetch import BatchPrefetcher

    list_file = _write_dataset(tmp_path, rng)
    ds = StereoDataset(list_file)
    sampler = TripletSampler(ds, seed=0)
    with BatchPrefetcher(sampler, 8, epoch_len=2, depth=2) as feed:
        with pytest.raises(ValueError):
            feed.next_batch(16)
        feed.next_batch(8)
        with pytest.raises(RuntimeError):
            feed.reset()  # one batch of the epoch still queued
        feed.next_batch(8)
        feed.reset()
        feed.next_batch(8)
