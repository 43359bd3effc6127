"""Single-camera pose analytics.

Rebuild of the reference's single-view pose pipeline (reference:
scripts/single_cam_pose.py:12-379): per-frame 33-landmark sequences ->
2D or 3D joint angles + per-joint statistics, no calibration required.

The reference processes frame-by-frame; here a whole clip's angles are
one vectorized program over (T, 33, C) landmark batches.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from stereo_vision_tpu.track.dual_camera import _angles_and_conf
from stereo_vision_tpu.track.joints import ANGLE_NAMES

import jax.numpy as jnp


class SingleCameraResult(NamedTuple):
    angles: np.ndarray           # (T, 8) degrees, NaN where not confident
    mean_confidence: np.ndarray  # (T, 8)
    stats: dict[str, dict[str, float]]


def analyze_single_camera(
    landmarks: np.ndarray, conf_threshold: float = 0.5
) -> SingleCameraResult:
    """(T, 33, 4) landmarks -> joint angles + per-joint summary stats
    (mean/std/min/max over confident frames, single_cam_pose.py:295-379)."""
    ang, conf = _angles_and_conf(jnp.asarray(landmarks, jnp.float64), conf_threshold)
    ang = np.asarray(ang)
    conf = np.asarray(conf)
    stats: dict[str, dict[str, float]] = {}
    for j, name in enumerate(ANGLE_NAMES):
        col = ang[:, j]
        ok = np.isfinite(col)
        if ok.any():
            stats[name] = {
                "mean": float(np.mean(col[ok])),
                "std": float(np.std(col[ok])),
                "min": float(np.min(col[ok])),
                "max": float(np.max(col[ok])),
                "visible_fraction": float(ok.mean()),
            }
        else:
            stats[name] = {"visible_fraction": 0.0}
    return SingleCameraResult(ang, conf, stats)
