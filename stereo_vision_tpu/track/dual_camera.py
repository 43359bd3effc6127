"""Uncalibrated dual-camera pose analysis.

Rebuild of the reference's no-extrinsics mode (reference:
stereo_calibration/scripts/non_extrinsic_3d_pose.py): per-camera 2D/3D
joint angles, per-joint selection from the higher-confidence camera
(:636-663), and occlusion statistics per joint (:673-686).

Everything operates on (T, 33, 4) landmark batches: angles for all frames
and all joints compute in one vectorized program; the per-frame dict
bookkeeping of the reference becomes masked array math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.track.angles import angle_3d
from stereo_vision_tpu.track.joints import ANGLE_NAMES, ANGLE_TRIPLE_INDICES, MEDIAPIPE_INDICES


class DualCameraResult(NamedTuple):
    left_angles: np.ndarray      # (T, 8), NaN where joints not confident
    right_angles: np.ndarray     # (T, 8)
    combined_angles: np.ndarray  # (T, 8) per-joint best-camera selection
    chose_left: np.ndarray       # (T, 8) bool: which camera won
    occlusion_stats: dict[str, dict[str, int]]


@jax.jit
def _angles_and_conf(landmarks: jnp.ndarray, conf_threshold: float):
    """(T, 33, 4) -> ((T, 8) angles with NaN gating, (T, 8) mean confidence).

    Angle formula and 3-point confidence gate follow the reference
    (non_extrinsic_3d_pose.py:577-633); joint confidence is the mean
    visibility of the triple (:668-671).
    """
    key = landmarks[:, MEDIAPIPE_INDICES]  # (T, 13, 4)
    idx = jnp.asarray(ANGLE_TRIPLE_INDICES)
    a = key[:, idx[:, 0], :3]
    b = key[:, idx[:, 1], :3]
    c = key[:, idx[:, 2], :3]
    ang = angle_3d(a, b, c)  # (T, 8)
    conf = (
        key[:, idx[:, 0], 3] + key[:, idx[:, 1], 3] + key[:, idx[:, 2], 3]
    ) / 3.0
    ok = (
        (key[:, idx[:, 0], 3] >= conf_threshold)
        & (key[:, idx[:, 1], 3] >= conf_threshold)
        & (key[:, idx[:, 2], 3] >= conf_threshold)
    )
    return jnp.where(ok, ang, jnp.nan), conf


def analyze_dual_camera(
    left_landmarks: np.ndarray,
    right_landmarks: np.ndarray,
    conf_threshold: float = 0.5,
) -> DualCameraResult:
    """Per-joint best-camera angle selection + occlusion statistics.

    Args:
      left_landmarks, right_landmarks: (T, 33, 4) MediaPipe-format
        landmark sequences (x, y, z, visibility).

    Selection rule (non_extrinsic_3d_pose.py:636-663): when both cameras
    yield the angle, take the one whose joint-triple mean visibility is
    higher (ties -> left); else whichever camera has it.
    """
    la, lc = _angles_and_conf(jnp.asarray(left_landmarks, jnp.float64), conf_threshold)
    ra, rc = _angles_and_conf(jnp.asarray(right_landmarks, jnp.float64), conf_threshold)
    la, lc, ra, rc = map(np.asarray, (la, lc, ra, rc))

    l_ok = np.isfinite(la)
    r_ok = np.isfinite(ra)
    prefer_left = lc >= rc
    chose_left = (l_ok & ~r_ok) | (l_ok & r_ok & prefer_left)
    combined = np.where(chose_left, la, ra)
    combined = np.where(l_ok | r_ok, combined, np.nan)

    stats: dict[str, dict[str, int]] = {}
    for j, name in enumerate(ANGLE_NAMES):
        stats[name] = {
            "both_visible": int((l_ok[:, j] & r_ok[:, j]).sum()),
            "left_visible": int((l_ok[:, j] & ~r_ok[:, j]).sum()),
            "right_visible": int((~l_ok[:, j] & r_ok[:, j]).sum()),
            "neither_visible": int((~l_ok[:, j] & ~r_ok[:, j]).sum()),
        }
    return DualCameraResult(la, ra, combined, chose_left, stats)


def occlusion_matrix(stats: dict[str, dict[str, int]]) -> np.ndarray:
    """(8, 4) visibility-category counts in ANGLE_NAMES order — the data
    behind the reference's occlusion heatmap (non_extrinsic_3d_pose.py:954)."""
    cats = ("both_visible", "left_visible", "right_visible", "neither_visible")
    return np.array([[stats[n][c] for c in cats] for n in ANGLE_NAMES])
