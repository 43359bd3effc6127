"""Pinhole + rational lens distortion: forward projection and inverse.

TPU-native replacements for ``cv2.projectPoints`` (reference:
stereo_calibration/scripts/intrinsic.py:229) and ``cv2.undistortPoints``
(reference: 3dpose.py:537-550, ball_drop.py:239-240). The distortion model
matches OpenCV's rational model with coefficients ordered
``(k1, k2, p1, p2, k3, k4, k5, k6)`` — the iPhone calibration in the
reference uses CALIB_RATIONAL_MODEL with k4..k6 fixed at 0
(intrinsic.py:282-285) so both 5- and 8-coefficient vectors are accepted.

All functions are pure jax.numpy, vmappable over points, cameras and frames.
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_vision_tpu.ops.rotation import rodrigues
from stereo_vision_tpu.utils.precision import highest_precision


def _dist8(dist: jnp.ndarray) -> jnp.ndarray:
    """Pad a distortion vector to 8 coefficients (k1 k2 p1 p2 k3 k4 k5 k6)."""
    dist = jnp.asarray(dist).reshape(-1)
    n = dist.shape[0]
    if n >= 8:
        return dist[:8]
    return jnp.concatenate([dist, jnp.zeros(8 - n, dist.dtype)])


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply forward distortion to normalized camera coordinates.

    Args:
      xy: (..., 2) normalized coordinates (X/Z, Y/Z).
      dist: distortion coefficients, any length up to 8.

    Returns:
      (..., 2) distorted normalized coordinates (before K).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = _dist8(dist)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@highest_precision
def project_points(
    obj_points: jnp.ndarray,
    rvec: jnp.ndarray,
    tvec: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
) -> jnp.ndarray:
    """Forward pinhole projection with distortion (cv2.projectPoints parity).

    Args:
      obj_points: (..., 3) world points.
      rvec: (3,) Rodrigues rotation vector.
      tvec: (3,) translation.
      K: (3, 3) camera matrix.
      dist: distortion coefficients.

    Returns:
      (..., 2) pixel coordinates.
    """
    R = rodrigues(jnp.asarray(rvec).reshape(3))
    t = jnp.asarray(tvec).reshape(3)
    cam = obj_points @ R.T + t
    xy = cam[..., :2] / cam[..., 2:3]
    xyd = distort_normalized(xy, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = xyd[..., 0] * fx + cx + K[0, 1] * xyd[..., 1]  # supports skew
    v = xyd[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def undistort_normalized(xy_dist: jnp.ndarray, dist: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Invert the distortion on normalized coordinates.

    Uses OpenCV's fixed-point compensation iteration. cv2 runs exactly 5
    iterations; we default to the same for bit-level parity (raise ``iters``
    for tighter convergence on strong distortion — each iteration is a
    handful of FLOPs, fully unrolled under jit).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = _dist8(dist)
    x0, y0 = xy_dist[..., 0], xy_dist[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        icdist = (1.0 + k4 * r2 + k5 * r4 + k6 * r6) / (
            1.0 + k1 * r2 + k2 * r4 + k3 * r6
        )
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * icdist
        y = (y0 - dy) * icdist
    return jnp.stack([x, y], axis=-1)


@highest_precision
def undistort_points(
    pts: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    R: jnp.ndarray | None = None,
    P: jnp.ndarray | None = None,
    iters: int = 5,
) -> jnp.ndarray:
    """cv2.undistortPoints parity: pixels -> undistorted coordinates.

    With ``R``/``P`` omitted returns normalized coordinates; with the
    rectification rotation ``R`` and new projection ``P`` (3x3 or 3x4)
    returns pixels in the rectified frame — exactly how the reference feeds
    triangulation (reference: checkerboard_distance.py:83-86, 3dpose.py:537-550).
    """
    pts = jnp.asarray(pts)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    skew = K[0, 1]
    y = (pts[..., 1] - cy) / fy
    x = (pts[..., 0] - cx - skew * y) / fx
    xy = undistort_normalized(jnp.stack([x, y], axis=-1), dist, iters=iters)
    if R is None and P is None:
        return xy
    xyw = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    if R is not None:
        xyw = xyw @ jnp.asarray(R).reshape(3, 3).T
    xy = xyw[..., :2] / xyw[..., 2:3]
    if P is None:
        return xy
    P = jnp.asarray(P)
    fxp, fyp = P[0, 0], P[1, 1]
    cxp, cyp = P[0, 2], P[1, 2]
    u = xy[..., 0] * fxp + cxp + P[0, 1] * xy[..., 1]
    v = xy[..., 1] * fyp + cyp
    return jnp.stack([u, v], axis=-1)
