"""Disparity-map evaluation (Middlebury bad-N metric).

The reference has no quantitative evaluation (correctness was judged by
submitting artifacts, reference: README.md:31); BASELINE.md defines bad-2.0
parity as this build's correctness north-star, so the metric lives here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def bad_n(
    disparity: np.ndarray, ground_truth: np.ndarray, threshold: float = 2.0
) -> float:
    """Fraction of valid-GT pixels whose error exceeds ``threshold``."""
    valid = np.isfinite(ground_truth)
    if not valid.any():
        return float("nan")
    err = np.abs(disparity - ground_truth)[valid]
    return float((err > threshold).mean())


def evaluate_pair(
    disparity: np.ndarray, ground_truth: np.ndarray
) -> Dict[str, float]:
    valid = np.isfinite(ground_truth)
    err = np.abs(disparity - ground_truth)[valid]
    return {
        "bad_0.5": float((err > 0.5).mean()),
        "bad_1.0": float((err > 1.0).mean()),
        "bad_2.0": float((err > 2.0).mean()),
        "bad_4.0": float((err > 4.0).mean()),
        "avg_err": float(err.mean()),
        "rms_err": float(np.sqrt((err ** 2).mean())),
        "coverage": float(valid.mean()),
    }
