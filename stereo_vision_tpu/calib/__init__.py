"""Camera calibration as JAX optimization.

TPU-native replacement for the reference's cv2-based calibration stack:
- intrinsics: cv2.calibrateCamera with iPhone flags + 2-round outlier
  rejection (reference: stereo_calibration/scripts/intrinsic.py:235-364)
- stereo extrinsics: cv2.stereoCalibrate with CALIB_FIX_INTRINSIC
  (reference: extrinsic.py:379-501)
- diversity-based frame selection (reference:
  calibration_tests/calibrate_v4/optimal_frame_extractor.py:26-94)
- quality gates (reference: calibrate_v4/runner.py:45-106)

The Levenberg-Marquardt solves run as jitted JAX programs (batched
residuals over frames x corners) instead of cv2's C++ LM.
"""

from stereo_vision_tpu.calib.targets import (
    checkerboard_object_points,
    canonical_corner_order,
)
from stereo_vision_tpu.calib.lm import levenberg_marquardt, LMResult
from stereo_vision_tpu.calib.intrinsics import (
    calibrate_camera,
    CameraCalibration,
    CalibrationFlags,
)
from stereo_vision_tpu.calib.extrinsics import calibrate_stereo, StereoCalibration
from stereo_vision_tpu.calib.selection import frame_diversity_features, select_diverse_frames
from stereo_vision_tpu.calib.gates import QualityGates, check_intrinsic_quality, check_stereo_quality

__all__ = [
    "checkerboard_object_points",
    "canonical_corner_order",
    "levenberg_marquardt",
    "LMResult",
    "calibrate_camera",
    "CameraCalibration",
    "CalibrationFlags",
    "calibrate_stereo",
    "StereoCalibration",
    "frame_diversity_features",
    "select_diverse_frames",
    "QualityGates",
    "check_intrinsic_quality",
    "check_stereo_quality",
]
