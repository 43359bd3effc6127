"""Stereo ball-trajectory analysis (drop / roll).

Rebuild of the reference's ball experiments (reference: ball_drop.py:297-
580, ball_motion.py:308-439): per-frame stereo detections are undistorted
and triangulated in one batched program, the drop segment is located, and
finite-difference kinematics recover gravity for the physical validation
(ball_drop.py:479-485).

The reference loops frames and calls cv2 per point; here the whole
trajectory triangulates in a single jit program.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.detect.ball import BallDetection
from stereo_vision_tpu.ops.distortion import undistort_points
from stereo_vision_tpu.ops.triangulate import triangulate_points
from stereo_vision_tpu.track.fusion import StereoRig
from stereo_vision_tpu.track.kinematics import (
    GRAVITY_MM_S2,
    detect_start_of_motion,
    estimate_gravity,
    theoretical_drop_velocity,
)


class BallTrajectory(NamedTuple):
    positions_3d: np.ndarray     # (T, 3) mm, NaN where undetected
    timestamps: np.ndarray       # (T,) seconds
    drop_start: int              # index where motion begins
    gravity_mm_s2: float | None
    gravity_error_pct: float | None
    velocities: np.ndarray       # (T-1, 3) mm/s
    valid: np.ndarray            # (T,) detection mask


@jax.jit
def _triangulate_batch(lpts, rpts, K1, d1, K2, d2, P1, P2):
    lu = undistort_points(lpts, K1, d1, P=K1)
    ru = undistort_points(rpts, K2, d2, P=K2)
    return triangulate_points(P1, P2, lu, ru)


def triangulate_detections(
    rig: StereoRig,
    left_centers: np.ndarray,
    right_centers: np.ndarray,
) -> np.ndarray:
    """(T, 2) + (T, 2) pixel centers -> (T, 3) mm positions (batched
    calculate_3d_position, ball_drop.py:225-259). NaN rows pass through."""
    K1, d1, K2, d2, R, T, P1, P2 = rig.as_arrays()
    l = jnp.nan_to_num(jnp.asarray(left_centers, jnp.float64))
    r = jnp.nan_to_num(jnp.asarray(right_centers, jnp.float64))
    p = np.array(_triangulate_batch(l, r, K1, d1, K2, d2, P1, P2))
    ok = np.isfinite(left_centers).all(-1) & np.isfinite(right_centers).all(-1)
    p[~ok] = np.nan
    return p


def analyze_ball_drop(
    rig: StereoRig,
    left_detections: Sequence[BallDetection | None],
    right_detections: Sequence[BallDetection | None],
    fps: float,
    drop_height_mm: float | None = None,
) -> BallTrajectory:
    """Full drop analysis: triangulate -> motion start -> gravity.

    Mirrors analyze_ball_drop (ball_drop.py:297-498): requires >10 valid
    frames for motion detection and >=10 post-start frames for the
    gravity estimate; y (axis 1) grows downward.
    """
    T = len(left_detections)
    lc = np.full((T, 2), np.nan)
    rc = np.full((T, 2), np.nan)
    for i, (ld, rd) in enumerate(zip(left_detections, right_detections)):
        if ld is not None and rd is not None:
            lc[i] = (ld.cx, ld.cy)
            rc[i] = (rd.cx, rd.cy)
    pos = triangulate_detections(rig, lc, rc)
    valid = np.isfinite(pos).all(-1)
    ts = np.arange(T) / fps

    vp = pos[valid]
    vt = ts[valid]
    drop_start = 0
    g = err = None
    velocities = np.full((max(T - 1, 0), 3), np.nan)
    if valid.sum() > 10:
        drop_start = detect_start_of_motion(vp)
        if drop_start < len(vp) - 10:
            seg_p = vp[drop_start:]
            seg_t = vt[drop_start:] - vt[drop_start]
            g, err = estimate_gravity(seg_p, seg_t)
        dv = np.diff(vp, axis=0) / np.diff(vt)[:, None]
        velocities = np.full((T - 1, 3), np.nan)
        velocities[np.flatnonzero(valid)[1:] - 1] = dv

    return BallTrajectory(
        positions_3d=pos,
        timestamps=ts,
        drop_start=int(drop_start),
        gravity_mm_s2=g,
        gravity_error_pct=err,
        velocities=velocities,
        valid=valid,
    )


def drop_report(traj: BallTrajectory, drop_height_mm: float | None = None) -> dict:
    """Summary dict mirroring the reference's JSON/report outputs
    (ball_drop.py:500-580)."""
    out = {
        "frames": int(len(traj.timestamps)),
        "valid_detections": int(traj.valid.sum()),
        "drop_start_index": traj.drop_start,
        "gravity_mm_s2": traj.gravity_mm_s2,
        "gravity_error_pct": traj.gravity_error_pct,
        "expected_gravity_mm_s2": GRAVITY_MM_S2,
    }
    if drop_height_mm is not None:
        out["theoretical_final_velocity_mm_s"] = theoretical_drop_velocity(drop_height_mm)
        v = traj.velocities
        ok = np.isfinite(v).all(-1)
        if ok.any():
            out["peak_measured_speed_mm_s"] = float(np.linalg.norm(v[ok], axis=1).max())
    return out
