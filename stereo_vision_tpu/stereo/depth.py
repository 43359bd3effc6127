"""Disparity → depth / 3D reprojection via the rectification Q matrix.

TPU-native equivalent of cv2.reprojectImageTo3D and the Z = f*B/d relation.
The Q matrix comes from stereo_vision_tpu.ops.stereo_rectify (reference
pipeline obtains it from cv2.stereoRectify — checkerboard_distance.py:49-51;
the saved artifact schema calls it disparity_to_depth_matrix.txt, see
SURVEY.md §2c).
"""

from __future__ import annotations

import jax.numpy as jnp


def reproject_disparity_to_3d(disparity: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Dense (H, W) disparity -> (H, W, 3) points via the 4x4 Q matrix.

    Invalid (non-positive) disparities produce non-finite Z; callers mask.
    """
    H, W = disparity.shape
    Q = jnp.asarray(Q)
    u = jnp.arange(W, dtype=disparity.dtype)
    v = jnp.arange(H, dtype=disparity.dtype)
    gu, gv = jnp.meshgrid(u, v)
    ones = jnp.ones_like(disparity)
    vec = jnp.stack([gu, gv, disparity, ones], axis=-1)  # (H, W, 4)
    out = vec @ Q.T
    return out[..., :3] / out[..., 3:4]


def depth_from_disparity(disparity: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Z-only fast path: Z = Q[2,3] / (Q[3,2]*d + Q[3,3])."""
    Q = jnp.asarray(Q)
    return Q[2, 3] / (Q[3, 2] * disparity + Q[3, 3])
