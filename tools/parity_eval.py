"""Quantitative parity report: jitted pipeline vs the reference-semantics
oracle chain on synthetic known-disparity scenes.

No Middlebury data ships in this environment, so correctness parity is
demonstrated on generated scenes (textured translations with occluded
borders) where ground truth is exact. For each scene the report shows the
bad-2.0 / avg error of: the oracle chain (the reference's semantics,
tests/oracles.py), the jitted pipeline with exact f32 CBCA, and with the
fast MXU CBCA mode. Run on CPU (oracles are loop-based):

    JAX_PLATFORMS=cpu python tools/parity_eval.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mccnn_tpu.models import init_params
    from mccnn_tpu.pipeline.match import match_pair
    from mccnn_tpu.utils.evaluate import evaluate_pair
    from oracles import (  # noqa: E402
        bilateral_oracle, cbca_oracle, cost_volume_oracle,
        cross_regions_oracle, interpolation_oracle, median_oracle,
        sgm_average_oracle, subpixel_oracle, wta_oracle,
    )
    from test_parity_metrics import _textured_pair  # noqa: E402
    from test_pipeline import CFG, _oracle_pipeline  # noqa: E402

    params = init_params(jax.random.key(3))
    rng = np.random.default_rng(42)
    rows = []
    for shift in (2, 3, 5):
        left, right, gt = _textured_pair(rng, height=28, width=44, shift=shift)
        ndisp = 8
        oracle = _oracle_pipeline(params, left, right, ndisp, CFG)
        exact = np.asarray(match_pair(
            params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
            cbca_impl="xla",
        ))
        fast = np.asarray(match_pair(
            params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
            cbca_impl="mxu",
        ))
        for name, disp in (("oracle", oracle), ("ours-exact", exact),
                           ("ours-mxu", fast)):
            m = evaluate_pair(disp, gt)
            rows.append((shift, name, m["bad_2.0"], m["avg_err"]))

    print(f"{'shift':>5} {'pipeline':>12} {'bad-2.0':>9} {'avg_err':>9}")
    for shift, name, bad2, avg in rows:
        print(f"{shift:>5} {name:>12} {bad2:>9.4f} {avg:>9.4f}")

    by_scene = {}
    for shift, name, bad2, _ in rows:
        by_scene.setdefault(shift, {})[name] = bad2
    worst = max(
        abs(v["ours-exact"] - v["oracle"]) for v in by_scene.values()
    )
    worst_mxu = max(
        abs(v["ours-mxu"] - v["oracle"]) for v in by_scene.values()
    )
    print(f"\nmax |bad-2.0 delta| vs oracle: exact={worst:.4f} "
          f"mxu={worst_mxu:.4f} (budget 0.005)")
    assert worst <= 0.005 and worst_mxu <= 0.005

    # ---- per-family report: the 4 synthetic scene families ------------
    # (translation / slanted plane / textureless patches / occlusion
    # geometry — utils/scenes.py). Occluded pixels (no correspondence)
    # are excluded from scoring, as Middlebury's nonocc metric does.
    from mccnn_tpu.utils.scenes import scene_pair

    print("\nPer-family parity (48x64 scenes):")
    print(f"{'family':>12} {'pipeline':>12} {'bad-2.0':>9} {'avg_err':>9}")
    fam_worst = {}
    for i, family in enumerate(
        ("translation", "slanted", "textureless", "occlusion")
    ):
        frng = np.random.default_rng(100 + i)
        left, right, gt, occluded, ndisp = scene_pair(
            family, frng, 48, 64, max_disparity=6
        )
        gt_eval = gt.copy()
        gt_eval[occluded] = np.inf
        oracle = _oracle_pipeline(params, left, right, ndisp, CFG)
        exact = np.asarray(match_pair(
            params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
            cbca_impl="xla",
        ))
        fast = np.asarray(match_pair(
            params, jnp.asarray(left), jnp.asarray(right), ndisp, CFG,
            cbca_impl="mxu",
        ))
        scores = {}
        for name, disp in (("oracle", oracle), ("ours-exact", exact),
                           ("ours-mxu", fast)):
            m = evaluate_pair(disp, gt_eval)
            scores[name] = m["bad_2.0"]
            print(f"{family:>12} {name:>12} {m['bad_2.0']:>9.4f} "
                  f"{m['avg_err']:>9.4f}")
        fam_worst[family] = max(
            abs(scores["ours-exact"] - scores["oracle"]),
            abs(scores["ours-mxu"] - scores["oracle"]),
        )
    worst_family = max(fam_worst.values())
    print(f"\nmax per-family |bad-2.0 delta| vs oracle: "
          f"{worst_family:.4f} (budget 0.005)")
    assert worst_family <= 0.005, fam_worst


if __name__ == "__main__":
    main()
