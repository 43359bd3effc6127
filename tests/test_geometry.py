"""Parity tests: ops geometry vs OpenCV (rotation, distortion, triangulation)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.ops import (
    rodrigues,
    rodrigues_inv,
    distort_normalized,
    project_points,
    undistort_points,
    triangulate_points,
    reprojection_error,
)

K = np.array([[1400.0, 0.0, 960.0], [0.0, 1410.0, 540.0], [0.0, 0.0, 1.0]])
DIST5 = np.array([-0.28, 0.09, 1.2e-3, -8e-4, -0.012])
DIST8 = np.array([-0.28, 0.09, 1.2e-3, -8e-4, -0.012, 0.05, -0.01, 0.002])


class TestRodrigues:
    @pytest.mark.parametrize(
        "rvec",
        [
            np.array([0.1, -0.2, 0.3]),
            np.array([0.0, 0.0, 0.0]),
            np.array([1e-9, -1e-9, 1e-9]),
            np.array([2.0, 1.0, -0.5]),
            np.array([np.pi, 0.0, 0.0]),
        ],
    )
    def test_forward_matches_cv2(self, rvec):
        R_cv, _ = cv2.Rodrigues(rvec)
        R_jax = np.asarray(rodrigues(jnp.asarray(rvec)))
        np.testing.assert_allclose(R_jax, R_cv, atol=1e-5)

    @pytest.mark.parametrize("seed", range(5))
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        rvec = rng.normal(size=3)
        rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0.01, 3.0)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        back = np.asarray(rodrigues_inv(jnp.asarray(R)))
        np.testing.assert_allclose(back, rvec, atol=1e-4)

    def test_inverse_matches_cv2(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            rvec = rng.normal(size=3)
            R, _ = cv2.Rodrigues(rvec)
            out = np.asarray(rodrigues_inv(jnp.asarray(R)))
            expected, _ = cv2.Rodrigues(R)
            np.testing.assert_allclose(out, expected.ravel(), atol=1e-4)


class TestProjectPoints:
    @pytest.mark.parametrize("dist", [DIST5, DIST8, np.zeros(5)])
    def test_matches_cv2(self, dist):
        rng = np.random.default_rng(0)
        obj = rng.uniform(-0.5, 0.5, size=(50, 3))
        obj[:, 2] += 3.0
        rvec = np.array([0.05, -0.1, 0.02])
        tvec = np.array([0.1, -0.05, 0.3])
        cv_pts, _ = cv2.projectPoints(obj, rvec, tvec, K, dist)
        jax_pts = np.asarray(
            project_points(jnp.asarray(obj), rvec, tvec, jnp.asarray(K), jnp.asarray(dist))
        )
        np.testing.assert_allclose(jax_pts, cv_pts.reshape(-1, 2), atol=2e-3)


class TestUndistortPoints:
    @pytest.mark.parametrize("dist", [DIST5, DIST8])
    def test_matches_cv2(self, dist):
        rng = np.random.default_rng(1)
        pts = rng.uniform([100, 100], [1800, 980], size=(200, 2))
        cv_out = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
        jax_out = np.asarray(undistort_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(dist)))
        np.testing.assert_allclose(jax_out, cv_out, atol=1e-5)

    def test_with_rectification(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform([200, 200], [1700, 900], size=(100, 2))
        Rrect, _ = cv2.Rodrigues(np.array([0.01, 0.02, -0.005]))
        P = np.array([[1500.0, 0, 950, 0], [0, 1500.0, 530, 0], [0, 0, 1, 0]])
        cv_out = cv2.undistortPoints(
            pts.reshape(-1, 1, 2), K, DIST5, R=Rrect, P=P
        ).reshape(-1, 2)
        jax_out = np.asarray(
            undistort_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(DIST5), R=Rrect, P=P)
        )
        np.testing.assert_allclose(jax_out, cv_out, atol=1e-3)

    def test_roundtrip_distort(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform([300, 300], [1600, 800], size=(50, 2))
        norm = undistort_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(DIST5), iters=20)
        redist = distort_normalized(norm, jnp.asarray(DIST5))
        back = np.stack(
            [
                np.asarray(redist[..., 0]) * K[0, 0] + K[0, 2],
                np.asarray(redist[..., 1]) * K[1, 1] + K[1, 2],
            ],
            axis=-1,
        )
        np.testing.assert_allclose(back, pts, atol=1e-3)


class TestTriangulate:
    def _stereo_setup(self):
        R, _ = cv2.Rodrigues(np.array([0.02, -0.3, 0.01]))
        T = np.array([-3500.0, 20.0, 80.0])  # mm, iPhone rig scale
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, T.reshape(3, 1)])
        return P1, P2, R, T

    def test_matches_cv2(self):
        P1, P2, R, T = self._stereo_setup()
        rng = np.random.default_rng(4)
        X = rng.uniform([-500, -500, 2000], [500, 500, 5000], size=(100, 3))
        pts1 = (P1 @ np.hstack([X, np.ones((100, 1))]).T).T
        pts1 = pts1[:, :2] / pts1[:, 2:3]
        pts2 = (P2 @ np.hstack([X, np.ones((100, 1))]).T).T
        pts2 = pts2[:, :2] / pts2[:, 2:3]

        cv_out = cv2.triangulatePoints(P1, P2, pts1.T, pts2.T)
        cv_out = (cv_out[:3] / cv_out[3]).T
        jax_out = np.asarray(triangulate_points(P1, P2, jnp.asarray(pts1), jnp.asarray(pts2)))
        np.testing.assert_allclose(jax_out, cv_out, rtol=1e-3, atol=0.5)
        np.testing.assert_allclose(jax_out, X, rtol=1e-3, atol=0.5)

    def test_noisy_reprojection_error(self):
        P1, P2, _, _ = self._stereo_setup()
        rng = np.random.default_rng(5)
        X = rng.uniform([-300, -300, 2500], [300, 300, 4000], size=(64, 3))
        h = np.hstack([X, np.ones((64, 1))])
        pts1 = (P1 @ h.T).T
        pts1 = pts1[:, :2] / pts1[:, 2:3] + rng.normal(0, 0.3, size=(64, 2))
        pts2 = (P2 @ h.T).T
        pts2 = pts2[:, :2] / pts2[:, 2:3] + rng.normal(0, 0.3, size=(64, 2))
        Xh = triangulate_points(P1, P2, jnp.asarray(pts1), jnp.asarray(pts2))
        err = np.asarray(reprojection_error(P1, P2, Xh, jnp.asarray(pts1), jnp.asarray(pts2)))
        assert err.mean() < 1.0  # sub-pixel residual on 0.3px noise

    def test_batched_shapes(self):
        P1, P2, _, _ = self._stereo_setup()
        pts1 = jnp.ones((7, 13, 2)) * 900.0
        pts2 = jnp.ones((7, 13, 2)) * 880.0
        out = triangulate_points(P1, P2, pts1, pts2)
        assert out.shape == (7, 13, 3)
