"""Bouguet stereo rectification and rectification-map generation.

TPU-native replacements for ``cv2.stereoRectify`` (reference:
stereo_calibration/scripts/checkerboard_distance.py:49-51,
calibration_tests/calibrate_v4/extrinsic.py:312) and
``cv2.initUndistortRectifyMap`` (reference: checkerboard_distance.py:54-57).

The implementation follows OpenCV's Bouguet algorithm semantics closely
(half-rotation split, epipole-alignment rotation, shared vertical principal
point, alpha-based free-scaling via inner/outer undistorted rectangles) so
that R1/R2/P1/P2/Q agree numerically with cv2 — parity is enforced by
tests/test_rectify.py. Pure jax.numpy; everything is closed-form (no solver).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_vision_tpu.ops.rotation import rodrigues, rodrigues_inv
from stereo_vision_tpu.utils.precision import highest_precision
from stereo_vision_tpu.ops.distortion import distort_normalized, undistort_points


class RectifyResult(NamedTuple):
    R1: jnp.ndarray  # (3, 3) rectification rotation, camera 1
    R2: jnp.ndarray  # (3, 3) rectification rotation, camera 2
    P1: jnp.ndarray  # (3, 4) rectified projection, camera 1
    P2: jnp.ndarray  # (3, 4) rectified projection, camera 2
    Q: jnp.ndarray   # (4, 4) disparity-to-depth reprojection matrix


def _rectangles(K, dist, R, P, image_size, n: int = 9):
    """Inner/outer bounding rectangles of the undistort-rectified image grid.

    Mirrors OpenCV's icvGetRectangles: an n*n grid of source pixels is
    undistorted into the rectified frame; the outer rect bounds all points,
    the inner rect is the largest axis-aligned rect fully inside the
    distorted border.
    """
    w, h = image_size
    # cv2 >= 5.0 samples the grid over [0, w-1] x [0, h-1].
    xs = jnp.arange(n) * ((w - 1) / (n - 1))
    ys = jnp.arange(n) * ((h - 1) / (n - 1))
    gx, gy = jnp.meshgrid(xs, ys)  # (n, n)
    pts = jnp.stack([gx, gy], axis=-1)
    u = undistort_points(pts, K, dist, R=R, P=P[:, :3])  # (n, n, 2)
    ox0, oy0 = jnp.min(u[..., 0]), jnp.min(u[..., 1])
    ox1, oy1 = jnp.max(u[..., 0]), jnp.max(u[..., 1])
    ix0 = jnp.max(u[:, 0, 0])       # left column
    ix1 = jnp.min(u[:, -1, 0])      # right column
    iy0 = jnp.max(u[0, :, 1])       # top row
    iy1 = jnp.min(u[-1, :, 1])      # bottom row
    inner = (ix0, iy0, ix1 - ix0, iy1 - iy0)
    outer = (ox0, oy0, ox1 - ox0, oy1 - oy0)
    return inner, outer


@highest_precision
def stereo_rectify(
    K1: jnp.ndarray,
    dist1: jnp.ndarray,
    K2: jnp.ndarray,
    dist2: jnp.ndarray,
    image_size: tuple[int, int],
    R: jnp.ndarray,
    T: jnp.ndarray,
    alpha: float = -1.0,
    new_image_size: tuple[int, int] | None = None,
    zero_disparity: bool = True,
    horizontal_stereo: bool | None = None,
) -> RectifyResult:
    """Bouguet stereo rectification (cv2.stereoRectify parity).

    Args:
      K1, K2: (3, 3) camera matrices.  dist1, dist2: distortion coeffs.
      image_size: (width, height) of the calibration images.
      R, T: rotation/translation from camera 1 to camera 2 (stereoCalibrate
        convention).
      alpha: free scaling. -1 = default (no scaling), 0 = crop to valid,
        1 = keep all source pixels.
      new_image_size: optional (width, height) of the rectified images.
      zero_disparity: CALIB_ZERO_DISPARITY flag (reference always uses it).
      horizontal_stereo: rig layout (True = side-by-side cameras). The
        layout is a rig configuration fact; with concrete inputs it is
        derived from T automatically, but under ``jit`` it must be given
        explicitly (deriving it would need data-dependent control flow).

    Returns:
      RectifyResult(R1, R2, P1, P2, Q).
    """
    K1 = jnp.asarray(K1, jnp.float64 if jnp.zeros(0).dtype == jnp.float64 else jnp.float32)
    K2 = jnp.asarray(K2, K1.dtype)
    R = jnp.asarray(R).reshape(3, 3)
    T = jnp.asarray(T).reshape(3)
    nx, ny = image_size

    # Split the stereo rotation evenly between the two cameras.
    om = rodrigues_inv(R)
    r_r = rodrigues(-0.5 * om)
    t = r_r @ T

    # idx: 0 = horizontal stereo, 1 = vertical stereo (static config fact).
    if horizontal_stereo is not None:
        idx = 0 if horizontal_stereo else 1
    else:
        try:
            idx = int(jnp.abs(t[0]) <= jnp.abs(t[1]))
        except jax.errors.ConcretizationTypeError as e:
            raise ValueError(
                "stereo_rectify under jit needs horizontal_stereo=True/False "
                "(the rig layout cannot be derived from a traced T)"
            ) from e
    c = t[idx]
    nt = jnp.linalg.norm(t)
    uu = jnp.zeros(3).at[idx].set(jnp.where(c > 0, 1.0, -1.0))

    # Global rotation aligning the baseline with the image x (or y) axis.
    ww = jnp.cross(t, uu)
    nw = jnp.linalg.norm(ww)
    angle = jnp.arccos(jnp.clip(jnp.abs(c) / jnp.maximum(nt, 1e-12), -1.0, 1.0))
    ww = jnp.where(nw > 0, ww * (angle / jnp.maximum(nw, 1e-12)), ww)
    wR = rodrigues(ww)

    R1 = wR @ r_r.T
    R2 = wR @ r_r
    t_new = R2 @ T

    # New focal length: mean of the two cross-axis focals (cv2 >= 5.0 rule;
    # older releases used the barrel-distortion-shrunk minimum).
    fc_new = 0.5 * (K1[idx ^ 1, idx ^ 1] + K2[idx ^ 1, idx ^ 1])

    # New principal points: center the projected (undistorted, rectified)
    # image corners.
    cc_new = []
    corners = jnp.array(
        [[0.0, 0.0], [nx - 1.0, 0.0], [0.0, ny - 1.0], [nx - 1.0, ny - 1.0]]
    )
    for K, dist, Rk in ((K1, dist1, R1), (K2, dist2, R2)):
        xy = undistort_points(corners, K, dist)  # normalized
        xyw = jnp.concatenate([xy, jnp.ones((4, 1), xy.dtype)], axis=1) @ Rk.T
        proj = fc_new * xyw[:, :2] / xyw[:, 2:3]
        avg = jnp.mean(proj, axis=0)
        cc_new.append(jnp.array([(nx - 1) / 2, (ny - 1) / 2]) - avg)

    cc0, cc1 = cc_new
    if zero_disparity:
        mid = 0.5 * (cc0 + cc1)
        cc0 = cc1 = mid
    elif idx == 0:
        ymid = 0.5 * (cc0[1] + cc1[1])
        cc0 = cc0.at[1].set(ymid)
        cc1 = cc1.at[1].set(ymid)
    else:
        xmid = 0.5 * (cc0[0] + cc1[0])
        cc0 = cc0.at[0].set(xmid)
        cc1 = cc1.at[0].set(xmid)

    def make_P(f, cc, tk):
        P = jnp.zeros((3, 4))
        P = P.at[0, 0].set(f).at[1, 1].set(f).at[2, 2].set(1.0)
        P = P.at[0, 2].set(cc[0]).at[1, 2].set(cc[1])
        if tk is not None:
            P = P.at[idx, 3].set(tk)
        return P

    P1 = make_P(fc_new, cc0, None)
    P2 = make_P(fc_new, cc1, t_new[idx] * fc_new)

    new_size = new_image_size or image_size
    nwx, nwy = new_size
    cx1_0, cy1_0 = cc0[0], cc0[1]
    cx2_0, cy2_0 = cc1[0], cc1[1]
    cx1 = nwx * cx1_0 / nx
    cy1 = nwy * cy1_0 / ny
    cx2 = nwx * cx2_0 / nx
    cy2 = nwy * cy2_0 / ny
    s = jnp.asarray(1.0)

    if alpha >= 0:
        alpha = min(float(alpha), 1.0)
        inner1, outer1 = _rectangles(K1, dist1, R1, P1, image_size)
        inner2, outer2 = _rectangles(K2, dist2, R2, P2, image_size)

        def scale0(cx, cy, cx_0, cy_0, rect):
            x0, y0, rw, rh = rect
            return jnp.maximum(
                jnp.maximum(cx / (cx_0 - x0), cy / (cy_0 - y0)),
                jnp.maximum(
                    (nwx - 1 - cx) / (x0 + rw - cx_0),
                    (nwy - 1 - cy) / (y0 + rh - cy_0),
                ),
            )

        def scale1(cx, cy, cx_0, cy_0, rect):
            x0, y0, rw, rh = rect
            return jnp.minimum(
                jnp.minimum(cx / (cx_0 - x0), cy / (cy_0 - y0)),
                jnp.minimum(
                    (nwx - 1 - cx) / (x0 + rw - cx_0),
                    (nwy - 1 - cy) / (y0 + rh - cy_0),
                ),
            )

        s0 = jnp.maximum(
            scale0(cx1, cy1, cx1_0, cy1_0, inner1),
            scale0(cx2, cy2, cx2_0, cy2_0, inner2),
        )
        s1 = jnp.minimum(
            scale1(cx1, cy1, cx1_0, cy1_0, outer1),
            scale1(cx2, cy2, cx2_0, cy2_0, outer2),
        )
        s = s0 * (1.0 - alpha) + s1 * alpha

    fc_new = fc_new * s
    cc0 = jnp.array([cx1, cy1])
    cc1 = jnp.array([cx2, cy2])

    P1 = make_P(fc_new, cc0, None)
    P2 = make_P(fc_new, cc1, t_new[idx] * fc_new)

    cdiff = (cc0[0] - cc1[0]) if idx == 0 else (cc0[1] - cc1[1])
    Q = jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
        ]
    )
    Q = Q.at[0, 3].set(-cc0[0]).at[1, 3].set(-cc0[1]).at[2, 3].set(fc_new)
    Q = Q.at[3, 2].set(-1.0 / t_new[idx]).at[3, 3].set(cdiff / t_new[idx])

    return RectifyResult(R1, R2, P1, P2, Q)


@highest_precision
def init_undistort_rectify_map(
    K: jnp.ndarray,
    dist: jnp.ndarray,
    R: jnp.ndarray | None,
    new_K: jnp.ndarray,
    size: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cv2.initUndistortRectifyMap parity (CV_32FC1 map pair).

    For each rectified pixel, back-rotate into the original camera, apply
    forward distortion, and map through K — pure closed-form math, one jit
    evaluation for the whole map.

    Args:
      K, dist: original intrinsics.
      R: rectification rotation (or None for plain undistortion).
      new_K: (3, 3) or (3, 4) new camera / projection matrix.
      size: (width, height) of the rectified image.

    Returns:
      (map_x, map_y) each (height, width) float32: source pixel coordinates
      to sample for each destination pixel.
    """
    w, h = size
    new_K = jnp.asarray(new_K)[:3, :3]
    if R is None:
        R = jnp.eye(3, dtype=new_K.dtype)
    iR = jnp.linalg.inv(new_K @ jnp.asarray(R).reshape(3, 3))
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    gu, gv = jnp.meshgrid(u, v)  # (h, w)
    ones = jnp.ones_like(gu)
    xyw = jnp.einsum("ij,jhw->ihw", iR, jnp.stack([gu, gv, ones]))
    x = xyw[0] / xyw[2]
    y = xyw[1] / xyw[2]
    xyd = distort_normalized(jnp.stack([x, y], axis=-1), dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    skew = K[0, 1]
    map_x = fx * xyd[..., 0] + skew * xyd[..., 1] + cx
    map_y = fy * xyd[..., 1] + cy
    return map_x.astype(jnp.float32), map_y.astype(jnp.float32)
