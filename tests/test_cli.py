"""End-to-end CLI contract tests on tiny synthetic Middlebury scenes."""

import json
import os

import numpy as np
import pytest

from mccnn_tpu.io.pfm import read_pfm, write_pfm
from mccnn_tpu.models import init_params, save_params


def _write_scene(scene_dir, rng, height=24, width=40, ndisp=6):
    from PIL import Image

    scene_dir.mkdir(parents=True)
    base = (rng.random((height, width)) * 255).astype(np.uint8)
    shifted = np.roll(base, -3, axis=1)
    Image.fromarray(base, mode="L").save(scene_dir / "im0.png")
    Image.fromarray(shifted, mode="L").save(scene_dir / "im1.png")
    gt = np.full((height, width), 3.0, dtype=np.float32)
    write_pfm(gt, str(scene_dir / "disp0GT.pfm"))
    (scene_dir / "calib.txt").write_text(
        "cam0=[1 0 0]\ncam1=[1 0 0]\ndoffs=0\nbaseline=100\n"
        f"width={width}\nheight={height}\nndisp={ndisp}\n"
    )


def test_match_cli_end_to_end(tmp_path, rng):
    import jax

    from mccnn_tpu.cli.match import main

    data_dir = tmp_path / "data"
    for name in ("sceneA", "sceneB"):
        _write_scene(data_dir / name, rng)
    list_file = tmp_path / "list.txt"
    list_file.write_text(
        f"{data_dir}/sceneA/im0.png\n{data_dir}/sceneB/im0.png\n"
    )
    weights = tmp_path / "weights.npz"
    save_params(init_params(jax.random.key(0)), str(weights))
    save_dir = tmp_path / "out"

    main([
        "--list_file", str(list_file),
        "--resume", str(weights),
        "--data_dir", str(data_dir),
        "--save_dir", str(save_dir),
        "--tag", "t0",
        "--start", "0",
        "--end", "0",  # only sceneA: --start/--end slicing contract
        "--cbca_distance", "3",
        "--cbca_num_iterations1", "1",
        "--cbca_num_iterations2", "1",
        "--bucket", "8",
    ])

    res_dir = save_dir / "submit_t0" / "sceneA"
    img_dir = save_dir / "submit_t0_imgs" / "sceneA"
    assert (res_dir / "disp0MCCNN.pfm").exists()
    assert (res_dir / "timeMCCNN.txt").exists()
    assert (img_dir / "disp0MCCNN.pgm").exists()
    assert not (save_dir / "submit_t0" / "sceneB").exists()

    disparity = read_pfm(str(res_dir / "disp0MCCNN.pfm"))
    assert disparity.shape == (24, 40)
    assert np.isfinite(disparity).all()
    assert float((res_dir / "timeMCCNN.txt").read_text()) > 0


def test_match_cli_stage_times(tmp_path, rng, capsys):
    """--stage_times prints per-stage wall-clock (the reference's per-stage
    observability contract, reference: src/match.py:126-176) and produces
    the same artifacts."""
    import jax

    from mccnn_tpu.cli.match import main

    data_dir = tmp_path / "data"
    _write_scene(data_dir / "sceneA", rng)
    list_file = tmp_path / "list.txt"
    list_file.write_text(f"{data_dir}/sceneA/im0.png\n")
    weights = tmp_path / "weights.npz"
    save_params(init_params(jax.random.key(0)), str(weights))
    save_dir = tmp_path / "out"

    main([
        "--list_file", str(list_file),
        "--resume", str(weights),
        "--data_dir", str(data_dir),
        "--save_dir", str(save_dir),
        "--tag", "t0",
        "--start", "0",
        "--end", "0",
        "--cbca_distance", "3",
        "--cbca_num_iterations1", "1",
        "--cbca_num_iterations2", "1",
        "--bucket", "8",
        "--stage_times",
    ])

    printed = capsys.readouterr().out
    for stage in ("features", "cost_volume", "cbca_1", "sgm", "cbca_2",
                  "wta", "lr_interpolation", "subpixel", "median",
                  "bilateral"):
        assert stage in printed
    res_dir = save_dir / "submit_t0" / "sceneA"
    disparity = read_pfm(str(res_dir / "disp0MCCNN.pfm"))
    assert disparity.shape == (24, 40)
    assert np.isfinite(disparity).all()


def test_pipeline_stage_times_matches_fused(rng):
    """The staged observability path computes the same disparity as the
    single fused program (same ops, same order — only program boundaries
    differ)."""
    import jax

    from mccnn_tpu.pipeline.match import MatchPipeline, standardize_image
    from mccnn_tpu.utils.config import MatchConfig

    height, width, ndisp = 28, 44, 8
    base = rng.normal(size=(height, width)).astype(np.float32)
    left = standardize_image(base)
    right = standardize_image(np.roll(base, -2, axis=1))
    config = MatchConfig(cbca_distance=3, cbca_num_iterations_1=1,
                         cbca_num_iterations_2=1)
    params = init_params(jax.random.key(0))
    pipeline = MatchPipeline(params, config, bucket=4)

    fused = pipeline(left, right, ndisp)
    staged, times = pipeline.stage_times(left, right, ndisp)
    assert set(times) == {"features", "cost_volume", "cbca_1", "sgm",
                          "cbca_2", "wta", "lr_interpolation", "subpixel",
                          "median", "bilateral"}
    np.testing.assert_allclose(staged, fused, rtol=1e-5, atol=1e-4)


def test_train_cli_end_to_end(tmp_path, rng):
    from mccnn_tpu.cli.train import main

    data_dir = tmp_path / "data"
    for name in ("s0", "s1"):
        _write_scene(data_dir / name, rng, height=32, width=40)
    for split in ("train", "val"):
        (tmp_path / f"{split}.txt").write_text(
            f"{data_dir}/s0/im0.png\n{data_dir}/s1/im0.png\n"
        )
    ckpt_dir = tmp_path / "ckpt"
    metrics_dir = tmp_path / "tb"

    main([
        "--list_dir", str(tmp_path),
        "--tensorboard_dir", str(metrics_dir),
        "--checkpoint_dir", str(ckpt_dir),
        "--batch_size", "16",
        "--end_epoch", "2",
        "--print_freq", "1",
    ])

    assert (ckpt_dir / "model_epoch1.npz").exists()
    assert (ckpt_dir / "model_epoch2.npz").exists()
    records = [
        json.loads(line)
        for line in (metrics_dir / "metrics.jsonl").read_text().splitlines()
    ]
    events = {r["event"] for r in records}
    assert {"start", "train", "checkpoint", "val"} <= events


def test_train_cli_resume(tmp_path, rng):
    from mccnn_tpu.cli.train import main

    data_dir = tmp_path / "data"
    _write_scene(data_dir / "s0", rng, height=32, width=40)
    for split in ("train", "val"):
        (tmp_path / f"{split}.txt").write_text(f"{data_dir}/s0/im0.png\n")
    ckpt_dir = tmp_path / "ckpt"

    common = [
        "--list_dir", str(tmp_path),
        "--tensorboard_dir", str(tmp_path / "tb"),
        "--checkpoint_dir", str(ckpt_dir),
        "--batch_size", "8",
        "--print_freq", "100",
    ]
    main(common + ["--end_epoch", "1"])
    main(common + ["--end_epoch", "2",
                   "--resume", str(ckpt_dir / "model_epoch1.npz")])
    assert (ckpt_dir / "model_epoch2.npz").exists()


def test_train_cli_writes_tensorboard_events(tmp_path, rng):
    pytest.importorskip("tensorflow")
    from mccnn_tpu.cli.train import main

    data_dir = tmp_path / "data"
    _write_scene(data_dir / "s0", rng, height=32, width=40)
    for split in ("train", "val"):
        (tmp_path / f"{split}.txt").write_text(f"{data_dir}/s0/im0.png\n")
    metrics_dir = tmp_path / "tb"

    main([
        "--list_dir", str(tmp_path),
        "--tensorboard_dir", str(metrics_dir),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--batch_size", "8",
        "--end_epoch", "1",
        "--print_freq", "1",
    ])
    events = [f for f in os.listdir(metrics_dir) if "tfevents" in f]
    assert events, "no TensorBoard event files written"


def test_train_cli_data_parallel(tmp_path, rng):
    from mccnn_tpu.cli.train import main

    data_dir = tmp_path / "data"
    _write_scene(data_dir / "s0", rng, height=32, width=40)
    for split in ("train", "val"):
        (tmp_path / f"{split}.txt").write_text(f"{data_dir}/s0/im0.png\n")

    main([
        "--list_dir", str(tmp_path),
        "--tensorboard_dir", str(tmp_path / "tb"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--batch_size", "16",  # 2 per fake device
        "--end_epoch", "1",
        "--print_freq", "1",
        "--data_parallel",
    ])
    assert (tmp_path / "ckpt" / "model_epoch1.npz").exists()


def test_eval_cli_scene_and_direct_modes(tmp_path, rng, capsys):
    """cli.eval scores match artifacts vs GT: per-scene + pixel-weighted
    aggregate bad-N rows, JSONL report, --nonocc masking, direct mode.
    (The reference has no quantitative evaluation — README.md:31.)"""
    import jax
    from PIL import Image

    from mccnn_tpu.cli.eval import main as eval_main
    from mccnn_tpu.cli.match import main as match_main

    data_dir = tmp_path / "data"
    for name in ("sceneA", "sceneB"):
        _write_scene(data_dir / name, rng)
    # sceneA gets a non-occlusion mask excluding the left border band
    mask = np.full((24, 40), 255, dtype=np.uint8)
    mask[:, :6] = 128
    Image.fromarray(mask, mode="L").save(data_dir / "sceneA" / "mask0nocc.png")
    list_file = tmp_path / "list.txt"
    list_file.write_text(
        f"{data_dir}/sceneA/im0.png\n{data_dir}/sceneB/im0.png\n"
    )
    weights = tmp_path / "weights.npz"
    save_params(init_params(jax.random.key(0)), str(weights))
    save_dir = tmp_path / "out"

    match_main([
        "--list_file", str(list_file),
        "--resume", str(weights),
        "--data_dir", str(data_dir),
        "--save_dir", str(save_dir),
        "--tag", "t0",
        "--start", "0",
        "--end", "1",
        "--cbca_distance", "3",
        "--cbca_num_iterations1", "1",
        "--cbca_num_iterations2", "1",
        "--bucket", "8",
    ])
    capsys.readouterr()

    report = tmp_path / "report.jsonl"
    eval_main([
        "--list_file", str(list_file),
        "--data_dir", str(data_dir),
        "--save_dir", str(save_dir),
        "--tag", "t0",
        "--nonocc",
        "--report", str(report),
    ])
    out = capsys.readouterr().out
    assert "sceneA" in out and "sceneB" in out and "ALL (2 scenes" in out

    rows = [json.loads(line) for line in report.read_text().splitlines()]
    assert [r["scene"].split("/")[-1] for r in rows[:2]] == [
        "sceneA", "sceneB"]
    agg = rows[-1]
    assert agg["scene"] == "ALL" and agg["n_scenes"] == 2
    # sceneA scored only where mask==255 (34/40 columns), sceneB fully
    assert rows[0]["n_valid"] == 24 * 34
    assert rows[1]["n_valid"] == 24 * 40
    assert agg["n_valid"] == 24 * 34 + 24 * 40
    for row in rows:
        for key in ("bad_0.5", "bad_1", "bad_2", "bad_4", "avg_err",
                    "rms_err"):
            assert 0.0 <= row[key] or row[key] >= 0.0  # finite
        assert row["bad_4"] <= row["bad_2"] <= row["bad_1"] <= row["bad_0.5"]
    # pixel-weighted aggregate == recomputed from per-scene counts
    n0, n1 = rows[0]["n_valid"], rows[1]["n_valid"]
    expect = (rows[0]["bad_2"] * n0 + rows[1]["bad_2"] * n1) / (n0 + n1)
    assert abs(agg["bad_2"] - expect) < 1e-9

    # direct mode: perfect prediction scores zero everywhere
    gt_path = str(data_dir / "sceneA" / "disp0GT.pfm")
    capsys.readouterr()
    eval_main(["--pred", gt_path, "--gt", gt_path, "--thresholds", "1,2"])
    out = capsys.readouterr().out
    assert "ALL (1 scenes" in out
    last = out.strip().splitlines()[-1].split()
    assert float(last[-4]) == 0.0 and float(last[-3]) == 0.0  # bad-1, bad-2
