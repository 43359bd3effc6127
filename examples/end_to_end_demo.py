"""End-to-end demo on synthetic data (no captures needed, CPU-friendly).

Walks the full reference workflow (SURVEY.md §1) in one script:

  1. render synthetic checkerboard detections for a known rig
  2. intrinsic calibration (jitted LM) + quality gate
  3. stereo calibration + baseline validation
  4. Bouguet rectification + remap maps
  5. dense SGBM disparity on a synthetic textured pair + depth via Q
  6. physical validation report (baseline, distance)

Run: python examples/end_to_end_demo.py [--out /tmp/demo]
(Forces CPU by default so it runs anywhere; remove --cpu for TPU.)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stereo_vision_tpu_demo")
    ap.add_argument("--tpu", action="store_true", help="run on the default (TPU) backend")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.calib import (
        CalibrationFlags,
        calibrate_camera,
        calibrate_stereo,
        checkerboard_object_points,
    )
    from stereo_vision_tpu.ops.distortion import project_points
    from stereo_vision_tpu.ops.rectify import init_undistort_rectify_map, stereo_rectify
    from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
    from stereo_vision_tpu.pipeline.reporting import save_calibration_report
    from stereo_vision_tpu.stereo import StereoSGBMParams, stereo_sgbm, depth_from_disparity
    from stereo_vision_tpu.track.validators import validate_baseline, validate_distance

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    store = ArtifactStore(out)
    rng = np.random.default_rng(7)

    # --- ground-truth rig -------------------------------------------------
    size = (1280, 720)
    K_true = np.array([[900.0, 0, 640.0], [0, 900.0, 360.0], [0, 0, 1.0]])
    dist_true = np.array([-0.12, 0.03, 5e-4, -4e-4, -0.004])
    R_true = np.eye(3)
    T_true = np.array([-120.0, 0.0, 0.0])

    # --- 1. synthetic board detections ------------------------------------
    obj = np.asarray(checkerboard_object_points(9, 6, 30.0))
    det1, det2 = [], []
    while len(det1) < 14:
        rvec = rng.uniform(-0.4, 0.4, 3)
        tvec = np.array([rng.uniform(-250, 120), rng.uniform(-150, 80), rng.uniform(500, 1400)])
        p1 = np.asarray(project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K_true), jnp.asarray(dist_true)))
        tv2 = R_true @ tvec + T_true
        p2 = np.asarray(project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tv2), jnp.asarray(K_true), jnp.asarray(dist_true)))
        if all(((q > 15).all() and (q[:, 0] < size[0] - 15).all() and (q[:, 1] < size[1] - 15).all()) for q in (p1, p2)):
            det1.append(p1 + rng.normal(0, 0.08, p1.shape))
            det2.append(p2 + rng.normal(0, 0.08, p2.shape))
    det1, det2 = np.stack(det1), np.stack(det2)

    # --- 2. intrinsics -----------------------------------------------------
    cal1 = calibrate_camera(obj, det1, size, flags=CalibrationFlags())
    cal2 = calibrate_camera(obj, det2, size, flags=CalibrationFlags())
    print(f"intrinsics: rms left {cal1.rms:.4f}px right {cal2.rms:.4f}px")
    store.save_intrinsics("left", cal1.K, cal1.dist, cal1.rms)
    store.save_intrinsics("right", cal2.K, cal2.dist, cal2.rms)

    # --- 3. stereo ----------------------------------------------------------
    scal = calibrate_stereo(obj, det1, det2, cal1.K, cal1.dist, cal2.K, cal2.dist, size)
    store.save_extrinsics(scal.R, scal.T, scal.E, scal.F)
    vb = validate_baseline(scal.T, float(np.linalg.norm(T_true)), tolerance_percent=1.0)
    print(f"stereo: rms {scal.rms:.4f}px baseline {scal.baseline:.2f}mm "
          f"(true {np.linalg.norm(T_true):.1f}, err {vb.error_percent:.3f}%)")

    # --- 4. rectification ---------------------------------------------------
    R1, R2, P1, P2, Q = stereo_rectify(
        jnp.asarray(cal1.K), jnp.asarray(cal1.dist),
        jnp.asarray(cal2.K), jnp.asarray(cal2.dist),
        size, jnp.asarray(scal.R), jnp.asarray(scal.T), alpha=0.0,
    )
    store.save_rectification(R1, R2, P1, P2, Q)
    mx1, my1 = init_undistort_rectify_map(jnp.asarray(cal1.K), jnp.asarray(cal1.dist), R1, P1, size)
    print("rectification maps:", np.asarray(mx1).shape)

    # --- 5. dense disparity on a synthetic textured plane -------------------
    f_rect = float(np.asarray(P1)[0, 0])
    Z0 = 1500.0
    true_disp = f_rect * float(np.linalg.norm(np.asarray(scal.T))) / Z0
    tex = rng.integers(0, 255, (size[1], size[0] + 256)).astype(np.int32)
    shift = int(round(true_disp))
    leftI = jnp.asarray(tex[:, 128:128 + size[0]])
    rightI = jnp.asarray(tex[:, 128 + shift:128 + shift + size[0]])
    params = StereoSGBMParams(num_disparities=128, block_size=5, uniqueness_ratio=10)
    disp = np.asarray(jax.jit(lambda l, r: stereo_sgbm(l, r, params))(leftI, rightI))
    valid = disp > 0
    z = np.asarray(depth_from_disparity(jnp.asarray(disp), Q))
    print(f"SGBM: median disparity {np.median(disp[valid]):.2f} (expected {shift}), "
          f"median depth {np.median(z[valid]):.1f}mm, valid {valid.mean():.2f}")
    vd = validate_distance(
        np.stack([np.zeros(1), np.zeros(1), np.full(1, np.median(z[valid]))], 1),
        Z0, tolerance_percent=5.0,
    )

    # --- 6. report -----------------------------------------------------------
    rep = save_calibration_report(
        out / "report.pdf",
        intrinsics={
            "left": {"K": cal1.K, "dist": cal1.dist, "rms": cal1.rms},
            "right": {"K": cal2.K, "dist": cal2.dist, "rms": cal2.rms},
        },
        stereo={"baseline": scal.baseline, "rms": scal.rms, "R": scal.R, "T": scal.T},
        validation=[vb, vd],
    )
    summary = {
        "intrinsic_rms_px": [cal1.rms, cal2.rms],
        "stereo_rms_px": scal.rms,
        "baseline_error_pct": vb.error_percent,
        "median_disparity_px": float(np.median(disp[valid])),
        "median_depth_mm": float(np.median(z[valid])),
        "report": str(rep),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
