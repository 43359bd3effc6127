"""Stereo extrinsic calibration (cv2.stereoCalibrate CALIB_FIX_INTRINSIC).

Replaces the reference's calibrate_stereo (reference:
stereo_calibration/scripts/extrinsic.py:379-501): joint Levenberg-Marquardt
over the stereo transform (R, T) and per-frame board poses, with both
cameras' intrinsics held fixed — one jitted residual over all frames and
both views. Also produces E/F matrices and the baseline report the
reference prints (‖T‖ vs actual distance, extrinsic.py:438-445).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.calib.lm import levenberg_marquardt
from stereo_vision_tpu.calib.intrinsics import _zhang_init, _rvec_from_R
from stereo_vision_tpu.ops.distortion import distort_normalized
from stereo_vision_tpu.ops.rotation import rodrigues
from stereo_vision_tpu.utils.precision import highest_precision


@dataclasses.dataclass
class StereoCalibration:
    R: np.ndarray            # (3, 3) camera1 -> camera2 rotation
    T: np.ndarray            # (3,) translation
    E: np.ndarray            # (3, 3) essential matrix
    F: np.ndarray            # (3, 3) fundamental matrix
    rms: float               # RMS reprojection error over both views (px)
    baseline: float          # ‖T‖
    per_frame_errors: np.ndarray


def _hat_np(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


@highest_precision
def _residuals(params, obj, c1, c2, K1, d1, K2, d2):
    """params = [rvec_s(3), tvec_s(3), (rvec, tvec) * F] — poses are board
    in camera-1 frame; camera 2 adds the stereo transform."""
    rs, ts = params[:3], params[3:6]
    poses = params[6:].reshape(-1, 6)
    Rs = rodrigues(rs)

    def project(cam, K, dist):
        xy = cam[..., :2] / cam[..., 2:3]
        xyd = distort_normalized(xy, dist)
        u = xyd[..., 0] * K[0, 0] + K[0, 2]
        v = xyd[..., 1] * K[1, 1] + K[1, 2]
        return jnp.stack([u, v], axis=-1)

    def per_frame(pose):
        R = rodrigues(pose[:3])
        cam1 = obj @ R.T + pose[3:]
        cam2 = cam1 @ Rs.T + ts
        return project(cam1, K1, d1), project(cam2, K2, d2)

    p1, p2 = jax.vmap(per_frame)(poses)
    return jnp.concatenate([(p1 - c1).reshape(-1), (p2 - c2).reshape(-1)])


def calibrate_stereo(
    object_points: np.ndarray,
    image_points1: np.ndarray,
    image_points2: np.ndarray,
    K1: np.ndarray,
    dist1: np.ndarray,
    K2: np.ndarray,
    dist2: np.ndarray,
    image_size: tuple[int, int],
    max_iters: int = 80,
) -> StereoCalibration:
    """FIX_INTRINSIC stereo calibration from matched board detections.

    Args:
      object_points: (N, 3) board grid.
      image_points1/2: (F, N, 2) matched corners per camera.
      K1, dist1, K2, dist2: fixed intrinsics (from calibrate_camera).
    """
    obj = np.asarray(object_points, np.float64)
    if obj.ndim == 3:
        obj = obj[0]
    c1 = np.asarray(image_points1, np.float64)
    c2 = np.asarray(image_points2, np.float64)
    F_n = c1.shape[0]

    # Init: per-frame poses in each camera from homographies, stereo
    # transform as the average relative pose.
    _, rv1, tv1 = _zhang_init(obj, c1, image_size)
    _, rv2, tv2 = _zhang_init(obj, c2, image_size)
    # The Zhang init used each camera's own K estimate; redo pose init with
    # the provided (true) intrinsics via undistorted homography decomposition.
    rv1, tv1 = _poses_with_known_K(obj, c1, K1, dist1)
    rv2, tv2 = _poses_with_known_K(obj, c2, K2, dist2)

    Rs_acc = np.zeros((3, 3))
    T_acc = np.zeros(3)
    for f in range(F_n):
        R1m = _R_from_rvec(rv1[f])
        R2m = _R_from_rvec(rv2[f])
        Rrel = R2m @ R1m.T
        Trel = tv2[f] - Rrel @ tv1[f]
        Rs_acc += Rrel
        T_acc += Trel
    U, _, Vt = np.linalg.svd(Rs_acc / F_n)
    Rs0 = U @ Vt
    if np.linalg.det(Rs0) < 0:
        Rs0 = U @ np.diag([1, 1, -1]) @ Vt
    Ts0 = T_acc / F_n

    x0 = np.concatenate(
        [
            _rvec_from_R(Rs0),
            Ts0,
            np.concatenate([rv1, tv1], axis=1).reshape(-1),
        ]
    )

    K1j, K2j = jnp.asarray(K1), jnp.asarray(K2)
    d1j, d2j = jnp.asarray(np.asarray(dist1).ravel()), jnp.asarray(np.asarray(dist2).ravel())
    objj, c1j, c2j = jnp.asarray(obj), jnp.asarray(c1), jnp.asarray(c2)

    res = levenberg_marquardt(
        lambda p: _residuals(p, objj, c1j, c2j, K1j, d1j, K2j, d2j),
        jnp.asarray(x0),
        max_iters=max_iters,
    )
    p = np.asarray(res.params)
    R = _R_from_rvec(p[:3])
    T = p[3:6]

    r = np.asarray(
        _residuals(res.params, objj, c1j, c2j, K1j, d1j, K2j, d2j)
    )
    n_half = r.size // 2
    pts = r.reshape(-1, 2)
    rms = float(np.sqrt((pts ** 2).sum(-1).mean()))
    per_frame = (
        np.linalg.norm(r[:n_half].reshape(F_n, -1, 2), axis=-1).mean(1)
        + np.linalg.norm(r[n_half:].reshape(F_n, -1, 2), axis=-1).mean(1)
    ) / 2.0

    E = _hat_np(T) @ R
    Fm = np.linalg.inv(np.asarray(K2)).T @ E @ np.linalg.inv(np.asarray(K1))
    if abs(Fm[2, 2]) > 1e-12:
        Fm = Fm / Fm[2, 2]

    return StereoCalibration(
        R=R,
        T=T,
        E=E,
        F=Fm,
        rms=rms,
        baseline=float(np.linalg.norm(T)),
        per_frame_errors=per_frame,
    )


def _R_from_rvec(rv: np.ndarray) -> np.ndarray:
    return np.asarray(rodrigues(jnp.asarray(rv)))


def _poses_with_known_K(obj, corners, K, dist):
    """Planar-PnP pose init: undistort corners, homography vs board plane,
    decompose with the known K, then a tiny LM polish per frame."""
    from stereo_vision_tpu.ops.distortion import undistort_points
    from stereo_vision_tpu.calib.intrinsics import _homography_dlt

    F_n = corners.shape[0]
    rvs, tvs = [], []
    for f in range(F_n):
        norm = np.asarray(
            undistort_points(jnp.asarray(corners[f]), jnp.asarray(K), jnp.asarray(np.asarray(dist).ravel()), iters=20)
        )
        H = _homography_dlt(obj[:, :2], norm)  # obj plane -> normalized cam
        h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
        s = 1.0 / max(np.linalg.norm(h1), 1e-12)
        r1, r2, t = s * h1, s * h2, s * h3
        if t[2] < 0:
            r1, r2, t = -r1, -r2, -t
        r3 = np.cross(r1, r2)
        Rm = np.stack([r1, r2, r3], axis=1)
        U, _, Vt = np.linalg.svd(Rm)
        Rm = U @ Vt
        if np.linalg.det(Rm) < 0:
            Rm = U @ np.diag([1, 1, -1]) @ Vt
        rvs.append(_rvec_from_R(Rm))
        tvs.append(t)
    return np.stack(rvs), np.stack(tvs)
