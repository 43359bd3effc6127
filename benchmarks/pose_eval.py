"""Held-out pose fidelity eval: median 3D joint / angle error per seed.

Protocol of tests/test_e2e_detectors.py::test_pose_video_to_angles
(render_pose_stereo -> in-repo PoseNet -> fuse_pose_sequence ->
pose_angles vs GT) WITHOUT the mp4 roundtrip, over several held-out
seeds, sweeping the soft-argmax decode window (models/pose.py
``local_window``). Reference fidelity bar: MediaPipe-grade (~cm)
landmarks feeding 3dpose.py:330-341.

Usage: python benchmarks/pose_eval.py [--windows 0 2 3] [--seeds 2 5 11]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, nargs="+", default=[0, 2, 3])
    ap.add_argument("--seeds", type=int, nargs="+", default=[2, 5, 11])
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    import jax.numpy as jnp

    from stereo_vision_tpu.models.pretrained import (
        POSE_IMG_HW,
        load_pose_net,
    )
    from stereo_vision_tpu.synth import render_pose_stereo
    from stereo_vision_tpu.track.angles import pose_angles
    from stereo_vision_tpu.track.fusion import StereoRig, fuse_pose_sequence
    from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES

    import cv2

    f, W, H, baseline = 350.0, 320, 240, 500.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    rig = StereoRig(
        K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
        R=np.eye(3), T=np.array([-baseline, 0, 0]),
    )

    model, variables = load_pose_net()
    Ht, Wt = POSE_IMG_HW

    def landmarks(frames, window):
        T = frames.shape[0]
        s = min(Wt / W, Ht / H)
        Wr, Hr = int(round(W * s)), int(round(H * s))
        small = np.full((T, Ht, Wt, 3), 114, np.float32)
        for t in range(T):
            small[t, :Hr, :Wr] = cv2.resize(frames[t], (Wr, Hr))
        small /= 255.0
        lm = np.array(model.apply(
            variables, jnp.asarray(small), train=False, local_window=window
        ))
        lm[:, :, 0] *= Wt / s
        lm[:, :, 1] *= Ht / s
        return lm

    scenes = {
        seed: render_pose_stereo(rig, T=args.frames, H=H, W=W, seed=seed)
        for seed in args.seeds
    }

    for window in args.windows:
        errs, aerrs = [], []
        for seed, (lf, rf, gt33) in scenes.items():
            lml = landmarks(lf, window)
            lmr = landmarks(rf, window)
            poses = np.asarray(fuse_pose_sequence(
                jnp.asarray(lml), jnp.asarray(lmr), rig.as_arrays(),
                conf_threshold=0.5,
            ))
            gt13 = gt33[:, MEDIAPIPE_INDICES, :]
            finite = np.isfinite(poses).all(-1)
            err = np.linalg.norm(poses - gt13, axis=-1)[finite]
            ang = np.asarray(pose_angles(jnp.asarray(poses)))
            ang_gt = np.asarray(pose_angles(jnp.asarray(gt13)))
            ok = np.isfinite(ang) & np.isfinite(ang_gt)
            aerr = np.abs(ang - ang_gt)[ok]
            errs.append(np.median(err))
            aerrs.append(np.median(aerr))
            print(
                f"w={window} seed={seed}: joint med {np.median(err):6.1f} mm "
                f"p90 {np.percentile(err, 90):6.1f} | angle med "
                f"{np.median(aerr):5.2f} deg | fused {finite.mean():.0%}",
                flush=True,
            )
        print(
            f"w={window} MEAN-OF-SEEDS: joint {np.mean(errs):6.1f} mm, "
            f"angle {np.mean(aerrs):5.2f} deg",
            flush=True,
        )


if __name__ == "__main__":
    main()
