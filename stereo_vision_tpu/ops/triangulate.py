"""Sparse 3D triangulation (DLT) and reprojection error.

TPU-native replacement for ``cv2.triangulatePoints`` (reference:
stereo_calibration/scripts/3dpose.py:553, ball_drop.py:254,
calibration_tests/calibrate_v4/distance.py:204) and the rectified-frame
reprojection-error check (reference: checkerboard_distance.py:219-261).

Everything is batched: a single jitted call triangulates all joints of all
frames at once instead of the reference's per-point Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_vision_tpu.utils.precision import highest_precision


@highest_precision
def triangulate_points(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
) -> jnp.ndarray:
    """DLT triangulation of matched 2D points into 3D.

    Args:
      P1, P2: (3, 4) projection matrices (pixels).
      pts1, pts2: (..., 2) matched pixel coordinates per camera.

    Returns:
      (..., 3) triangulated points in the frame of P1.
    """
    P1 = jnp.asarray(P1)
    P2 = jnp.asarray(P2)
    x1, y1 = pts1[..., 0:1], pts1[..., 1:2]
    x2, y2 = pts2[..., 0:1], pts2[..., 1:2]
    # Rows of the 4x4 DLT system: x*P[2]-P[0], y*P[2]-P[1] per camera.
    r0 = x1 * P1[2] - P1[0]
    r1 = y1 * P1[2] - P1[1]
    r2 = x2 * P2[2] - P2[0]
    r3 = y2 * P2[2] - P2[1]
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # (..., 4, 4)
    # Normalize rows by the norm of their first three columns: with
    # pixel-scale projection matrices the raw normal equations span ~1e12,
    # which float32 on TPU cannot resolve. Scaling by the XYZ part keeps the
    # least-squares weighting of cv2's DLT while conditioning the system.
    A = A / jnp.maximum(jnp.linalg.norm(A[..., :3], axis=-1, keepdims=True), 1e-12)
    # Finite scene points: solve the inhomogeneous 3x3 normal equations
    # (W = 1). Cheaper and far better conditioned in float32 than the
    # homogeneous 4x4 eigenproblem; identical to cv2 for non-ideal points.
    M = A[..., :3]
    b = -A[..., 3]
    MtM = jnp.swapaxes(M, -1, -2) @ M
    Mtb = jnp.einsum("...ij,...i->...j", M, b)
    return jnp.linalg.solve(MtM, Mtb[..., None])[..., 0]


def triangulate_normalized(
    R: jnp.ndarray,
    T: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
) -> jnp.ndarray:
    """Triangulate from normalized (undistorted) coordinates given stereo R, T.

    Convenience for the calibrated-pair path: P1 = [I|0], P2 = [R|T].
    """
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([jnp.asarray(R).reshape(3, 3), jnp.asarray(T).reshape(3, 1)], axis=1)
    return triangulate_points(P1, P2, xy1, xy2)


@highest_precision
def project_homogeneous(P: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Project 3D points with a (3, 4) matrix; returns (..., 2) pixels."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    uvw = Xh @ jnp.asarray(P).T
    return uvw[..., :2] / uvw[..., 2:3]


def reprojection_error(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    X: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
) -> jnp.ndarray:
    """Mean symmetric reprojection error in pixels (per point).

    Mirrors the reference's rectified-frame error metric
    (checkerboard_distance.py:219-261): project the triangulated points with
    both cameras and average the Euclidean pixel errors.
    """
    e1 = jnp.linalg.norm(project_homogeneous(P1, X) - pts1, axis=-1)
    e2 = jnp.linalg.norm(project_homogeneous(P2, X) - pts2, axis=-1)
    return 0.5 * (e1 + e2)


triangulate_points_jit = jax.jit(triangulate_points)
