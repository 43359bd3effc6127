"""Interop with the reference's committed calibration artifacts.

The reference repo ships real calibration outputs
(/root/reference/calibration_tests/calibrate_v*/ — SURVEY.md §2c
fixtures). These tests load those exact files and run our geometry stack
on them, cross-checked against cv2 on the same inputs — proving a user's
existing on-disk calibrations work unchanged.
"""

from pathlib import Path

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map

GOLDEN = Path("/root/reference/calibration_tests/calibrate_v2")

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(), reason="reference artifacts not mounted"
)


def _load_golden():
    K1 = np.loadtxt(GOLDEN / "multi_view_calib/camera_1_matrix.txt")
    d1 = np.loadtxt(GOLDEN / "multi_view_calib/camera_1_distortion.txt")
    K2 = np.loadtxt(GOLDEN / "multi_view_calib/camera_2_matrix.txt")
    d2 = np.loadtxt(GOLDEN / "multi_view_calib/camera_2_distortion.txt")
    sdir = GOLDEN / "stereo_calibration_results"
    R = np.loadtxt(sdir / "stereo_rotation_matrix.txt")
    T = np.loadtxt(sdir / "stereo_translation_vector.txt")
    return K1, d1, K2, d2, R, T


class TestGoldenArtifacts:
    def test_schema_loads(self):
        K1, d1, K2, d2, R, T = _load_golden()
        assert K1.shape == (3, 3) and R.shape == (3, 3) and T.size == 3
        # rational-model distortion: 14 coeffs with k4 live
        assert d1.size == 14 and abs(d1[7]) > 1.0
        # committed rectification products load too
        sdir = GOLDEN / "stereo_calibration_results"
        for name in ("rect_R1", "rect_R2", "rect_P1", "rect_P2"):
            m = np.loadtxt(sdir / f"{name}.txt")
            assert m.shape in ((3, 3), (3, 4))
        Q = np.loadtxt(sdir / "disparity_to_depth_matrix.txt")
        assert Q.shape == (4, 4)

    def test_rectify_matches_cv2_on_golden_rig(self):
        """Bouguet rectification parity on the REAL rig parameters."""
        K1, d1, K2, d2, R, T = _load_golden()
        size = (1220, 1020)  # reference capture size (cx, cy doubled)
        ref = cv2.stereoRectify(
            K1, d1[:8], K2, d2[:8], size, R, T.reshape(3, 1), alpha=0
        )
        R1c, R2c, P1c, P2c, Qc = ref[:5]
        R1, R2, P1, P2, Q = stereo_rectify(
            jnp.asarray(K1), jnp.asarray(d1[:8]),
            jnp.asarray(K2), jnp.asarray(d2[:8]),
            size, jnp.asarray(R), jnp.asarray(T), alpha=0.0,
        )
        np.testing.assert_allclose(np.asarray(R1), R1c, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R2), R2c, atol=1e-6)
        np.testing.assert_allclose(np.asarray(P1), P1c, rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(P2), P2c, rtol=1e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Q), Qc, rtol=1e-6, atol=1e-4)

    def test_undistort_rectify_map_on_golden_rig(self):
        K1, d1, K2, d2, R, T = _load_golden()
        size = (320, 260)  # small map for speed; same math
        R1, R2, P1, P2, Q = stereo_rectify(
            jnp.asarray(K1), jnp.asarray(d1[:8]),
            jnp.asarray(K2), jnp.asarray(d2[:8]),
            size, jnp.asarray(R), jnp.asarray(T), alpha=0.0,
        )
        mx, my = init_undistort_rectify_map(
            jnp.asarray(K1), jnp.asarray(d1[:8]), R1, P1, size
        )
        mxc, myc = cv2.initUndistortRectifyMap(
            K1, d1[:8], np.asarray(R1), np.asarray(P1)[:3, :3], size, cv2.CV_32FC1
        )
        np.testing.assert_allclose(np.asarray(mx), mxc, atol=2e-2)
        np.testing.assert_allclose(np.asarray(my), myc, atol=2e-2)

    def test_triangulation_with_golden_rig(self):
        """Project + triangulate a synthetic point cloud through the real
        rig: metric recovery must be exact (DLT on noiseless data)."""
        from stereo_vision_tpu.ops.distortion import project_points, undistort_points
        from stereo_vision_tpu.ops.triangulate import triangulate_points

        K1, d1, K2, d2, R, T = _load_golden()
        rng = np.random.default_rng(0)
        # The golden v2 rig is a ~90-degree converged pair: sample a broad
        # cloud and keep only points visible (in front, near the principal
        # axis) in BOTH cameras — the same constraint real captures obey.
        pts = np.column_stack(
            [
                rng.uniform(-4000, 6000, 3000),
                rng.uniform(-4000, 5000, 3000),
                rng.uniform(1000, 12000, 3000),
            ]
        )
        cam2 = pts @ R.T + T.reshape(1, 3)
        w, h = 1220.0, 1020.0

        def visible(cam, K):
            z_ok = cam[:, 2] > 500
            x = K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2]
            y = K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2]
            # stay near the image center: the strong rational distortion
            # is only invertible where the reference actually had data
            return z_ok & (x > w * 0.2) & (x < w * 0.8) & (y > h * 0.2) & (y < h * 0.8)

        keep = visible(pts, K1) & visible(cam2, K2)
        pts = pts[keep]
        assert len(pts) >= 5, "not enough mutually visible samples"
        rvec0 = np.zeros(3)
        rvec2, _ = cv2.Rodrigues(R)
        p1 = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(rvec0), jnp.zeros(3), jnp.asarray(K1), jnp.asarray(d1[:8])))
        p2 = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(rvec2.ravel()), jnp.asarray(T), jnp.asarray(K2), jnp.asarray(d2[:8])))
        u1 = undistort_points(jnp.asarray(p1), jnp.asarray(K1), jnp.asarray(d1[:8]), P=jnp.asarray(K1))
        u2 = undistort_points(jnp.asarray(p2), jnp.asarray(K2), jnp.asarray(d2[:8]), P=jnp.asarray(K2))
        # The golden rational model (k2 ~ 55, k4 ~ 980) is only invertible
        # near where the reference had data; keep points whose undistortion
        # actually recovered the ideal pinhole projection (cv2 behaves
        # identically — its iterative inverse diverges on the same points).
        def ideal(cam, K):
            xy = cam[:, :2] / cam[:, 2:]
            return xy @ np.diag([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])

        ok = (
            (np.linalg.norm(np.asarray(u1) - ideal(pts, K1), axis=1) < 1e-6)
            & (np.linalg.norm(np.asarray(u2) - ideal(cam2[keep], K2), axis=1) < 1e-6)
        )
        assert ok.sum() >= 5, "not enough invertible samples"
        pts = pts[ok][:15]
        u1 = jnp.asarray(np.asarray(u1)[ok][:15])
        u2 = jnp.asarray(np.asarray(u2)[ok][:15])
        P1 = K1 @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K2 @ np.hstack([R, T.reshape(3, 1)])
        rec = np.asarray(triangulate_points(jnp.asarray(P1), jnp.asarray(P2), u1, u2))
        np.testing.assert_allclose(rec, pts, atol=0.01)



def test_reference_calibration_results_pkl_roundtrip():
    """Read the reference's committed per-camera calibration pickle and
    drive our geometry with it: project the checkerboard with its rvec/
    tvec/K/dist and verify the distortion inverse round-trips."""
    import jax.numpy as jnp

    from stereo_vision_tpu.ops.distortion import project_points, undistort_points
    from stereo_vision_tpu.ops.rotation import rodrigues
    from stereo_vision_tpu.pipeline.artifacts import load_calibration_results_pkl


    p = GOLDEN / "camera1_calib_images" / "calibration_results.pkl"
    if not p.exists():
        pytest.skip("pickle not committed in this snapshot")
    K, dist, rvecs, tvecs, rms = load_calibration_results_pkl(p)
    assert K.shape == (3, 3) and K[0, 0] > 100
    assert len(rvecs) == len(tvecs) >= 1
    assert np.isfinite(rms)

    obj = np.zeros((24, 3))
    obj[:, 0] = np.tile(np.arange(6), 4) * 25.0
    obj[:, 1] = np.repeat(np.arange(4), 6) * 25.0
    img = np.asarray(
        project_points(
            jnp.asarray(obj), jnp.asarray(rvecs[0]), jnp.asarray(tvecs[0]),
            jnp.asarray(K), jnp.asarray(dist),
        )
    )
    assert np.isfinite(img).all()
    # Undistort back to normalized coords: the Newton inverse must
    # round-trip through the reference's real coefficients.
    R = np.asarray(rodrigues(jnp.asarray(rvecs[0])))
    cam = obj @ R.T + tvecs[0]
    norm = np.asarray(
        undistort_points(jnp.asarray(img), jnp.asarray(K), jnp.asarray(dist))
    )
    np.testing.assert_allclose(norm, cam[:, :2] / cam[:, 2:3], atol=1e-6)
