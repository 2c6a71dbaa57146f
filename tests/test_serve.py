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


def test_serve_synchronous_client(tmp_path, rng):
    """A client that waits for scene N's response before sending N+1 must
    not deadlock: when no further request is immediately readable the
    server finalizes the in-flight scene and emits its response before
    blocking on stdin (ADVICE round-4). Uses real pipes so the fd/select
    path is exercised (the StringIO tests cover the fd-less fallback)."""
    import os
    import select
    import threading
    import time

    import jax

    from mccnn_tpu.cli.serve import main

    data_dir = tmp_path / "data"
    _write_scene(data_dir / "a", rng, height=24, width=40)
    _write_scene(data_dir / "b", rng, height=24, width=40)
    weights = tmp_path / "weights.npz"
    save_params(init_params(jax.random.key(0)), str(weights))
    out = tmp_path / "out"

    req_r, req_w = os.pipe()
    res_r, res_w = os.pipe()
    server = threading.Thread(
        target=main,
        args=(["--resume", str(weights), "--bucket", "8"],),
        kwargs={"stdin": os.fdopen(req_r, "r"),
                "stdout": os.fdopen(res_w, "w")},
        daemon=True,
    )
    server.start()
    requests = os.fdopen(req_w, "w")
    buf = b""

    def next_response(timeout=600.0):
        nonlocal buf
        deadline = time.time() + timeout
        while b"\n" not in buf:
            remaining = deadline - time.time()
            assert remaining > 0, (
                "server did not respond before the next request was sent "
                "(synchronous-client deadlock)"
            )
            if select.select([res_r], [], [], remaining)[0]:
                chunk = os.read(res_r, 65536)
                assert chunk, "server closed stdout unexpectedly"
                buf += chunk
        line, buf = buf.split(b"\n", 1)
        return json.loads(line)

    try:
        assert next_response()["event"] == "ready"
        requests.write(f"{data_dir}/a {out}/a\n")
        requests.flush()
        first = next_response()  # must arrive with no second request sent
        assert first["ok"] is True
        assert (out / "a" / "disp0MCCNN.pfm").exists()
        requests.write(f"{data_dir}/b {out}/b\n")
        requests.flush()
        assert next_response()["ok"] is True
        assert (out / "b" / "disp0MCCNN.pfm").exists()
    finally:
        requests.close()
    server.join(timeout=60)
    assert not server.is_alive()


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
