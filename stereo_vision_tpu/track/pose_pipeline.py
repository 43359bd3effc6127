"""Flagship stereo-pose workflow orchestration.

The reference's ``process_synchronized_videos`` loop (reference:
3dpose.py:270-476) glues sync -> per-frame MediaPipe -> EMA -> per-joint
triangulation -> constraints -> angles -> save. This is the batched
equivalent: landmark sequences in (from any detector — the flax PoseNet,
MediaPipe run offline, or recorded fixtures), full analytics out, with
the reference's artifact set (pickles/CSV/stats/plots) written through
the pipeline layer.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import NamedTuple

import numpy as np

from stereo_vision_tpu.track.angles import pose_angles
from stereo_vision_tpu.track.fusion import StereoRig, fuse_pose_sequence
from stereo_vision_tpu.track.joints import ANGLE_NAMES, JOINT_NAMES
from stereo_vision_tpu.track.smoothing import MotionSmoother


class PoseWorkflowResult(NamedTuple):
    poses_raw: np.ndarray       # (T, 13, 3) fused 3D poses (mm)
    poses_smoothed: np.ndarray  # (T, 13, 3)
    angles_raw: np.ndarray      # (T, 8) degrees
    angles_smoothed: np.ndarray
    smoothing_stats: dict


def run_pose_workflow(
    rig: StereoRig,
    left_landmarks: np.ndarray,
    right_landmarks: np.ndarray,
    smoothing_preset: str = "smalliphone",
    conf_threshold: float = 0.65,
    out_dir: str | Path | None = None,
    fps: float = 30.0,
) -> PoseWorkflowResult:
    """Fuse + constrain + smooth a synchronized landmark sequence pair.

    Args:
      left_landmarks, right_landmarks: (T, 33, 4) pixel-space landmark
        sequences [x, y, z, visibility], already synchronized (use
        sync.StereoFrameMapper / flash offsets upstream).
      out_dir: when given, writes the reference's artifact set
        (3dpose.py:917-1023): pose pickles (pre- and post-smoothing),
        angle CSV, stats JSON, angle/trajectory plots.
    """
    import jax.numpy as jnp

    T = left_landmarks.shape[0]
    # Whole sequence fused as ONE device program (lax.scan over T) — the
    # per-frame host loop is kept only for true streaming
    # (StereoPoseTracker.process_frame), reference hot loop 3dpose.py:358-462.
    poses = np.asarray(
        fuse_pose_sequence(
            jnp.asarray(left_landmarks, jnp.float64),
            jnp.asarray(right_landmarks, jnp.float64),
            rig.as_arrays(),
            conf_threshold=conf_threshold,
        )
    )

    smoother = MotionSmoother(smoothing_preset)
    smoothed = smoother.smooth_pose_sequence(poses)

    ang_raw = np.asarray(pose_angles(jnp.asarray(poses)))
    ang_sm = np.asarray(pose_angles(jnp.asarray(smoothed)))

    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        import pickle

        with open(out / "pose_3d_original.pkl", "wb") as f:
            pickle.dump(poses, f)
        with open(out / "pose_3d_smoothed.pkl", "wb") as f:
            pickle.dump(smoothed, f)
        # angle CSV (3dpose.py:978-1023 schema: frame, time, angles...)
        import csv

        with open(out / "joint_angles.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["frame", "time_s", *ANGLE_NAMES])
            for t in range(T):
                w.writerow([t, t / fps, *[f"{a:.3f}" for a in ang_sm[t]]])
        (out / "smoothing_stats.json").write_text(json.dumps(smoother.stats, indent=2))
        # Per-joint angle statistics, txt + csv (3dpose.py:978-1023 schema).
        with np.errstate(all="ignore"):
            stat_rows = []
            for j, name in enumerate(ANGLE_NAMES):
                a = ang_sm[:, j]
                a = a[np.isfinite(a)]
                if len(a):
                    stat_rows.append(
                        (name, a.mean(), np.median(a), a.std(), a.min(), a.max())
                    )
        txt = ["Angle Statistics for 3D Pose", ""]
        for name, mean, med, std, lo, hi in stat_rows:
            txt += [
                f"{name.replace('_', ' ').title()}:",
                f"  Mean: {mean:.2f}°",
                f"  Median: {med:.2f}°",
                f"  Standard Deviation: {std:.2f}°",
                f"  Range: {lo:.2f}° - {hi:.2f}°",
                "",
            ]
        (out / "angle_statistics.txt").write_text("\n".join(txt) + "\n")
        with open(out / "angle_statistics.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["joint", "mean", "median", "std", "min", "max"])
            for name, mean, med, std, lo, hi in stat_rows:
                w.writerow([name] + [f"{v:.2f}" for v in (mean, med, std, lo, hi)])
        try:
            from stereo_vision_tpu.pipeline.reporting import (
                save_angle_series,
                save_trajectory_3d,
            )

            save_angle_series(ang_raw, fps, out / "angles.png", smoothed=ang_sm)
            save_trajectory_3d(smoothed, out / "trajectory.png")
        except Exception:  # plotting is best-effort (headless variations)
            pass

    return PoseWorkflowResult(poses, smoothed, ang_raw, ang_sm, smoother.stats)
