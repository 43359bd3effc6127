"""Rotation parameterizations: Rodrigues vector <-> matrix, Euler reports.

TPU-native replacement for ``cv2.Rodrigues`` as used by the reference's
stereo-calibration report (reference: stereo_calibration/scripts/extrinsic.py:447-454)
and the Levenberg-Marquardt calibration solvers. Pure jax.numpy, safe at the
origin (Taylor branches), fully vmappable and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from stereo_vision_tpu.utils.precision import highest_precision

_EPS = 1e-8


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of a 3-vector."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


@highest_precision
def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (3,) -> rotation matrix (3, 3).

    Uses the Rodrigues formula with a second-order Taylor expansion near
    theta=0 so the function stays differentiable at the origin (needed by
    the LM calibration solver, unlike cv2 which special-cases numerically).
    """
    rvec = jnp.asarray(rvec).reshape(3)
    theta2 = jnp.dot(rvec, rvec)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _hat(rvec)  # un-normalized: K = theta * hat(axis)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks (accurate, smooth).
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + a * K + b * (K @ K)


@highest_precision
def rodrigues_inv(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3, 3) -> rotation vector (3,).

    Matches cv2.Rodrigues(R) for proper rotations, including the theta≈pi
    branch (axis from the diagonal of (R + I)/2).
    """
    R = jnp.asarray(R).reshape(3, 3)
    # Antisymmetric part gives axis*sin(theta).
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = 0.5 * jnp.linalg.norm(w)  # sin(theta)
    c = jnp.clip(0.5 * (jnp.trace(R) - 1.0), -1.0, 1.0)  # cos(theta)
    theta = jnp.arctan2(s, c)

    # Generic branch: axis = w / (2 sin theta).
    generic = jnp.where(s > 1e-6, theta / jnp.maximum(2.0 * s, _EPS), 0.5) * w

    # theta ~ pi branch: R + I = 2 (I c + (1-c) rr^T) => rr^T from diagonal.
    A = 0.5 * (R + jnp.eye(3, dtype=R.dtype))
    diag = jnp.clip(jnp.diagonal(A) - c, 0.0, None) / jnp.maximum(1.0 - c, _EPS)
    axis_abs = jnp.sqrt(diag + _EPS * _EPS)
    # Resolve signs from off-diagonals relative to the largest component.
    k = jnp.argmax(axis_abs)
    off = 0.5 * (R + R.T)  # symmetric part; off[i,j] = (1-c) r_i r_j for i!=j
    signs = jnp.sign(off[k, :] + 1e-30 * jnp.ones(3))
    axis_pi = axis_abs * signs * jnp.sign(axis_abs[k] + _EPS)
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi), _EPS)
    near_pi = jnp.logical_and(s <= 1e-6, c < 0.0)

    # theta ~ 0: zero vector (covered by `generic` since w -> 0).
    return jnp.where(near_pi, theta * axis_pi, generic)


def euler_angles_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """XYZ (pitch-yaw-roll) Euler angles in degrees, matching the reference's
    human-readable stereo report (reference: extrinsic.py:447-454)."""
    R = jnp.asarray(R).reshape(3, 3)
    sy = jnp.sqrt(R[0, 0] * R[0, 0] + R[1, 0] * R[1, 0])
    singular = sy < 1e-6
    x = jnp.where(singular, jnp.arctan2(-R[1, 2], R[1, 1]), jnp.arctan2(R[2, 1], R[2, 2]))
    y = jnp.arctan2(-R[2, 0], sy)
    z = jnp.where(singular, 0.0, jnp.arctan2(R[1, 0], R[0, 0]))
    return jnp.degrees(jnp.stack([x, y, z]))
