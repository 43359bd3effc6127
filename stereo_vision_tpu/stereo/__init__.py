"""Dense stereo disparity on TPU: block matching, semi-global matching,
post-processing and disparity→depth reprojection.

The reference pipeline is sparse-only (cv2.triangulatePoints on matched
points — see SURVEY.md §0); dense BM/SGBM is the capability extension
defined by /root/repo/BASELINE.json, with parity measured against
cv2.StereoBM / cv2.StereoSGBM.
"""

from stereo_vision_tpu.stereo.bm import StereoBMParams, stereo_bm
from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
from stereo_vision_tpu.stereo.hier import (
    HIER_FAST,
    HierParams,
    stereo_sgbm_hier,
    stereo_sgbm_hier_batch,
)
from stereo_vision_tpu.stereo.depth import reproject_disparity_to_3d, depth_from_disparity
from stereo_vision_tpu.stereo.postprocess import speckle_filter, left_right_check

__all__ = [
    "StereoBMParams",
    "stereo_bm",
    "StereoSGBMParams",
    "stereo_sgbm",
    "HierParams",
    "HIER_FAST",
    "stereo_sgbm_hier",
    "stereo_sgbm_hier_batch",
    "reproject_disparity_to_3d",
    "depth_from_disparity",
    "speckle_filter",
    "left_right_check",
]
