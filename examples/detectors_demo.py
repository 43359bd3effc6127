"""Learned-detector workflows end to end on synthetic footage.

Renders stereo ball-drop and pose videos, then runs the SAME CLI
commands a user would (reference workflows: ball_drop.py, 3dpose.py),
using only the in-repo trained weights — no captures, no downloads:

  1. render + encode stereo mp4 pairs (synth/scenes.py)
  2. save a known calibration to the artifact store
  3. `ball-drop`: YOLOv8 detections -> triangulate -> gravity report
  4. `pose`: pose net -> fuse -> smooth -> angles + artifacts
  5. `animate`: side-by-side raw-vs-smoothed skeleton video

Run: python examples/detectors_demo.py [--out /tmp/detectors_demo]
(CPU by default; pass --tpu to run on the default backend.)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/detectors_demo")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stereo_vision_tpu.io.video import write_video
    from stereo_vision_tpu.models.pretrained import BALL_WEIGHTS, POSE_WEIGHTS
    from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
    from stereo_vision_tpu.pipeline.cli import main as cli
    from stereo_vision_tpu.synth import render_ball_drop_stereo, render_pose_stereo
    from stereo_vision_tpu.track.fusion import StereoRig

    if not (BALL_WEIGHTS.exists() and POSE_WEIGHTS.exists()):
        raise SystemExit(
            "in-repo weights missing; train them with "
            "`python -m stereo_vision_tpu.models.pretrained`"
        )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    K = np.array([[350.0, 0, 160], [0, 350.0, 120], [0, 0, 1.0]])
    rig = StereoRig(
        K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
        R=np.eye(3), T=np.array([-500.0, 0, 0]),
    )
    store = ArtifactStore(out)
    store.save_intrinsics("left", rig.K1, rig.d1)
    store.save_intrinsics("right", rig.K2, rig.d2)
    store.save_extrinsics(rig.R, rig.T)

    print("== ball drop ==")
    fps = 240.0
    lf, rf, _, _, _ = render_ball_drop_stereo(
        rig, T=120, fps=fps, H=240, W=320, hold_frames=25,
        ball_radius_mm=80.0, seed=3,
    )
    write_video(out / "drop_left.mp4", lf, fps=fps)
    write_video(out / "drop_right.mp4", rf, fps=fps)
    rc = cli([
        "ball-drop", "--test-dir", str(out),
        "--left", str(out / "drop_left.mp4"),
        "--right", str(out / "drop_right.mp4"),
        "--fps", str(fps),
    ])
    assert rc == 0

    print("== stereo pose ==")
    lf, rf, _ = render_pose_stereo(rig, T=24, H=240, W=320, seed=2)
    write_video(out / "pose_left.mp4", lf, fps=30)
    write_video(out / "pose_right.mp4", rf, fps=30)
    rc = cli([
        "pose", "--test-dir", str(out),
        "--left", str(out / "pose_left.mp4"),
        "--right", str(out / "pose_right.mp4"),
    ])
    assert rc == 0

    print("== smoothing animation ==")
    pose_dir = out / "results" / "pose"
    rc = cli([
        "animate",
        "--raw", str(pose_dir / "pose_3d_original.pkl"),
        "--smoothed", str(pose_dir / "pose_3d_smoothed.pkl"),
        "--out", str(out / "smoothing_compare.mp4"),
        "--fps", "4", "--duration", "4",
    ])
    assert rc == 0
    print(json.dumps({"done": True, "artifacts": str(out)}))


if __name__ == "__main__":
    main()
