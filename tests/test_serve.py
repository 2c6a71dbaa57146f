"""Serving entry point: warmup + long-lived serve loop (cli/serve.py).

The serving contract (BASELINE.md "Serving"): one process precompiles the
announced shape buckets, then serves scene after scene at steady-state
latency, emitting the reference's Middlebury artifacts per scene
(reference: src/match.py:52-54) plus one JSON status line per request.
"""

import io
import json

import numpy as np

from mccnn_tpu.io.pfm import read_pfm
from mccnn_tpu.models import init_params, save_params

from test_cli import _write_scene


def _run_serve(tmp_path, rng, requests, extra_args=()):
    import jax

    from mccnn_tpu.cli.serve import main

    weights = tmp_path / "weights.npz"
    if not weights.exists():
        save_params(init_params(jax.random.key(0)), str(weights))
    stdout = io.StringIO()
    main(
        ["--resume", str(weights), "--bucket", "8", *extra_args],
        stdin=io.StringIO("".join(requests)),
        stdout=stdout,
    )
    return [json.loads(line) for line in stdout.getvalue().splitlines()]


def test_serve_warmup_and_requests(tmp_path, rng):
    data_dir = tmp_path / "data"
    _write_scene(data_dir / "warm", rng, height=24, width=40)
    _write_scene(data_dir / "cold", rng, height=32, width=48)
    warmup_list = tmp_path / "warm.txt"
    warmup_list.write_text(f"{data_dir}/warm/im0.png\n")

    out = tmp_path / "out"
    responses = _run_serve(
        tmp_path, rng,
        [f"{data_dir}/warm {out}/warm\n",
         f"{data_dir}/cold {out}/cold\n",
         f"{data_dir}/cold {out}/cold2\n"],
        extra_args=["--warmup_list", str(warmup_list)],
    )

    ready, first, second, third = responses
    assert ready["event"] == "ready" and ready["warmed"] == 1
    # warmed bucket serves warm; unannounced bucket pays its compile once
    assert first["ok"] and first["warm"] is True
    assert second["ok"] and second["warm"] is False
    assert third["ok"] and third["warm"] is True

    for name, shape in (("warm", (24, 40)), ("cold", (32, 48))):
        disparity = read_pfm(str(out / name / "disp0MCCNN.pfm"))
        assert disparity.shape == shape
        assert np.isfinite(disparity).all()
        assert (out / name / "disp0MCCNN.pgm").exists()
        assert float((out / name / "timeMCCNN.txt").read_text()) > 0


def test_serve_bad_scene_does_not_kill_server(tmp_path, rng):
    data_dir = tmp_path / "data"
    _write_scene(data_dir / "good", rng)
    out = tmp_path / "out"
    responses = _run_serve(
        tmp_path, rng,
        [f"{data_dir}/missing {out}/missing\n",
         f"{data_dir}/good {out}/good\n"],
    )
    ready, bad, good = responses
    assert ready["event"] == "ready"
    assert bad["ok"] is False and "error" in bad
    assert good["ok"] is True
    assert (out / "good" / "disp0MCCNN.pfm").exists()
