import os
import struct

import numpy as np
import pytest

from mccnn_tpu.io import parse_calib, read_pfm, write_pfm
from mccnn_tpu.io.middlebury import derive_scene_paths, save_disparity_pgm


def test_pfm_round_trip(tmp_path, rng):
    data = rng.normal(size=(7, 5)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    write_pfm(data, path)
    np.testing.assert_array_equal(read_pfm(path), data)


def test_pfm_bytes_match_reference_layout(tmp_path):
    """Byte-for-byte contract: Pf header, bottom-up raster, little-endian."""
    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    path = str(tmp_path / "x.pfm")
    write_pfm(data, path)
    with open(path, "rb") as f:
        raw = f.read()
    expected = b"Pf\n3 2\n-1.0\n"
    for h in (1, 0):  # bottom-up
        for w in range(3):
            expected += struct.pack("<f", data[h, w])
    assert raw == expected


def test_pfm_reads_big_endian(tmp_path):
    data = np.arange(4, dtype=np.float32).reshape(2, 2)
    path = str(tmp_path / "be.pfm")
    with open(path, "wb") as f:
        f.write(b"Pf\n2 2\n1.0\n")
        f.write(data[::-1].astype(">f4").tobytes())
    np.testing.assert_array_equal(read_pfm(path), data)


def test_pfm_handles_inf(tmp_path):
    data = np.array([[1.0, np.inf], [2.0, 3.0]], dtype=np.float32)
    path = str(tmp_path / "inf.pfm")
    write_pfm(data, path)
    np.testing.assert_array_equal(read_pfm(path), data)


def test_parse_calib(tmp_path):
    path = str(tmp_path / "calib.txt")
    with open(path, "w") as f:
        f.write(
            "cam0=[999 0 0]\ncam1=[999 0 0]\ndoffs=131\nbaseline=193\n"
            "width=2964\nheight=1988\nndisp=280\nisint=0\nvmin=31\nvmax=257\n"
        )
    assert parse_calib(path) == (1988, 2964, 280)


def test_derive_scene_paths():
    paths = derive_scene_paths(
        "/data/trainingH/Adirondack/im0.png\n", "/data", "/out", "run1"
    )
    assert paths.right == "/data/trainingH/Adirondack/im1.png"
    assert paths.calib == "/data/trainingH/Adirondack/calib.txt"
    assert paths.out_pfm == "/out/submit_run1/trainingH/Adirondack/disp0MCCNN.pfm"
    assert paths.out_pgm == "/out/submit_run1_imgs/trainingH/Adirondack/disp0MCCNN.pgm"
    assert paths.out_time == "/out/submit_run1/trainingH/Adirondack/timeMCCNN.txt"


def test_save_disparity_pgm(tmp_path):
    path = str(tmp_path / "d.pgm")
    save_disparity_pgm(np.array([[0.4, 300.0], [-3.0, 128.0]]), path)
    with open(path, "rb") as f:
        raw = f.read()
    assert raw == b"P5\n2 2\n255\n" + bytes([0, 255, 0, 128])


def test_pgm_bytes_match_cv2(tmp_path, rng):
    """The reference writes PGM via cv2.imwrite (reference: src/util.py:50-52);
    with cv2 available, require byte-identical output for float disparities."""
    cv2 = pytest.importorskip("cv2")

    disparity = (rng.random((13, 17)) * 260 - 2).astype(np.float32)
    ours = str(tmp_path / "ours.pgm")
    theirs = str(tmp_path / "cv2.pgm")
    save_disparity_pgm(disparity, ours)
    cv2.imwrite(theirs, disparity)
    with open(ours, "rb") as f:
        a = f.read()
    with open(theirs, "rb") as f:
        b = f.read()
    assert a == b
