"""Geometry and image primitives (pure jax.numpy / Pallas, vmappable)."""

from stereo_vision_tpu.ops.rotation import (
    rodrigues,
    rodrigues_inv,
    euler_angles_from_matrix,
)
from stereo_vision_tpu.ops.distortion import (
    distort_normalized,
    undistort_points,
    project_points,
)
from stereo_vision_tpu.ops.triangulate import (
    triangulate_points,
    triangulate_normalized,
    reprojection_error,
)
from stereo_vision_tpu.ops.rectify import (
    stereo_rectify,
    init_undistort_rectify_map,
)
from stereo_vision_tpu.ops.remap import remap_bilinear

__all__ = [
    "rodrigues",
    "rodrigues_inv",
    "euler_angles_from_matrix",
    "distort_normalized",
    "undistort_points",
    "project_points",
    "triangulate_points",
    "triangulate_normalized",
    "reprojection_error",
    "stereo_rectify",
    "init_undistort_rectify_map",
    "remap_bilinear",
]
