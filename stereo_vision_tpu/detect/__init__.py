"""Image-space detectors: checkerboard corners, circles, ball scoring,
and the cv2-replacement image primitives (SURVEY.md §2d).
"""

from stereo_vision_tpu.detect.image_ops import (
    rgb_to_gray,
    rgb_to_hsv,
    gaussian_blur,
    otsu_threshold,
    otsu_binarize,
    in_range,
    binary_erode,
    binary_dilate,
    resize_bilinear,
    sobel_magnitude,
)
from stereo_vision_tpu.detect.circles import (
    Circle,
    hough_circles,
    hough_accumulator,
    mask_circularity,
    min_enclosing_circle,
    region_circularity,
    largest_component_mask,
    otsu_foreground,
)
from stereo_vision_tpu.detect.ball import (
    BallDetection,
    rescore_detections,
    color_fraction,
    depth_from_apparent_size,
    estimate_focal_length,
    ORANGE_HSV_RANGE,
    BLUE_HSV_RANGE,
)
from stereo_vision_tpu.detect.cache import DetectionCache, image_hash
from stereo_vision_tpu.detect.hosted import (
    HostedDetectorClient,
    ROBOFLOW_BLUE_HSV_RANGE,
    local_transport,
)
from stereo_vision_tpu.detect.checkerboard import (
    harris_response,
    checkerboard_response,
    refine_corners_subpix,
    find_chessboard_corners,
)

__all__ = [
    "rgb_to_gray",
    "rgb_to_hsv",
    "gaussian_blur",
    "otsu_threshold",
    "otsu_binarize",
    "in_range",
    "binary_erode",
    "binary_dilate",
    "resize_bilinear",
    "sobel_magnitude",
    "Circle",
    "hough_circles",
    "hough_accumulator",
    "mask_circularity",
    "min_enclosing_circle",
    "region_circularity",
    "largest_component_mask",
    "otsu_foreground",
    "BallDetection",
    "rescore_detections",
    "color_fraction",
    "depth_from_apparent_size",
    "estimate_focal_length",
    "ORANGE_HSV_RANGE",
    "BLUE_HSV_RANGE",
    "harris_response",
    "checkerboard_response",
    "refine_corners_subpix",
    "find_chessboard_corners",
    "DetectionCache",
    "image_hash",
    "HostedDetectorClient",
    "ROBOFLOW_BLUE_HSV_RANGE",
    "local_transport",
]
