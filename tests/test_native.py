"""Native (C++) host-sampler bindings: build, semantics, parity."""

import shutil

import numpy as np
import pytest

from mccnn_tpu import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and not native.available(),
    reason="no C++ toolchain and no prebuilt library",
)


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.ensure_built(), "failed to build native library"


def _gt(rng, height=40, width=60, ndisp=12):
    gt = rng.uniform(0, ndisp, size=(height, width)).astype(np.float32)
    gt[rng.random((height, width)) < 0.15] = np.inf
    return gt


def test_sample_triplets_constraints(rng):
    gt = _gt(rng)
    height, width = gt.shape
    rows, cols, pos_cols, neg_cols = native.sample_triplets(
        gt, 32, 7, 0.5, 1.5, 6.0
    )
    assert ((rows >= 0) & (rows < height)).all()
    assert ((cols >= 0) & (cols < width)).all()
    anchors = gt[rows, cols]
    assert np.isfinite(anchors).all()
    assert (anchors.astype(np.int64) <= cols).all()

    base = cols - anchors.astype(np.int64)
    assert ((pos_cols >= 0) & (pos_cols < width)).all()
    assert (np.abs(pos_cols - base) <= 1).all()
    assert ((neg_cols >= 0) & (neg_cols < width)).all()
    assert (np.abs(neg_cols - base) >= 1).all()
    assert (np.abs(neg_cols - base) <= 6).all()


def test_sample_triplets_permutation_proposals(rng):
    # With an all-valid GT map no anchor is resampled, so the initial
    # permutation proposals survive: rows and cols must each be
    # duplicate-free (reference src/datagenerator.py:162-163).
    height, width = 40, 60
    gt = np.zeros((height, width), dtype=np.float32)
    for seed in range(5):
        rows, cols, _, _ = native.sample_triplets(gt, 32, seed, 0.5, 1.5, 6.0)
        assert len(np.unique(rows)) == 32
        assert len(np.unique(cols)) == 32


def test_sample_triplets_batch_larger_than_image_raises(rng):
    gt = _gt(rng, height=16, width=60)
    with pytest.raises(ValueError, match="permutation"):
        native.sample_triplets(gt, 32, 0, 0.5, 1.5, 6.0)


def test_sample_triplets_rejects_all_invalid():
    gt = np.full((8, 8), np.inf, dtype=np.float32)
    with pytest.raises(ValueError):
        native.sample_triplets(gt, 4, 0, 0.5, 1.5, 6.0)


def test_extract_patches_matches_numpy_padding(rng):
    image = rng.normal(size=(15, 21)).astype(np.float32)
    rows = np.array([0, 7, 14, 3], dtype=np.int64)
    cols = np.array([0, 10, 20, 5], dtype=np.int64)
    patches = native.extract_patches(image, rows, cols, 11)

    padded = np.pad(image, 5)
    for b in range(len(rows)):
        expected = padded[rows[b]: rows[b] + 11, cols[b]: cols[b] + 11]
        np.testing.assert_array_equal(patches[b], expected)


def test_native_sampler_backend_end_to_end(tmp_path, rng):
    from test_sampler import _write_dataset

    from mccnn_tpu.data.dataset import StereoDataset
    from mccnn_tpu.data.sampler import TripletSampler

    list_file = _write_dataset(tmp_path, rng)
    sampler = TripletSampler(StereoDataset(list_file), seed=0, backend="native")
    left, pos, neg = sampler.next_batch(32)
    for t in (left, pos, neg):
        assert t.shape == (32, 11, 11, 1)
        assert t.dtype == np.float32
        assert np.isfinite(t).all()
