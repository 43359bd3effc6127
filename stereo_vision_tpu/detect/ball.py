"""Ball detection scoring and monocular depth.

Rebuild of the reference's detector post-processing (the YOLO forward pass
itself lives in stereo_vision_tpu.models):

- circularity-based confidence rescoring (reference: ball_drop.py:89-160,
  single_cam_drop.py:15-117),
- HSV color-percentage boosting (single_cam_drop.py:56-82 orange,
  archive/roboflow_ball_detector.py:206-214 blue),
- pinhole depth-from-apparent-size Z = D*f/d_px and the inverse focal
  estimate f = d_px*Z/D (single_cam_drop.py:330-340, :712-727).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.detect.circles import region_circularity
from stereo_vision_tpu.detect.image_ops import in_range, rgb_to_gray, rgb_to_hsv


class BallDetection(NamedTuple):
    cx: float
    cy: float
    radius: float
    confidence: float


# HSV ranges in cv2 8-bit convention (H in [0,180)).
ORANGE_HSV_RANGE = (np.array([5.0, 120.0, 120.0]), np.array([25.0, 255.0, 255.0]))
BLUE_HSV_RANGE = (np.array([100.0, 150.0, 50.0]), np.array([140.0, 255.0, 255.0]))


def color_fraction(region_rgb: np.ndarray, hsv_range=ORANGE_HSV_RANGE) -> float:
    """Percentage of pixels inside an HSV range (single_cam_drop.py:66-68)."""
    hsv = rgb_to_hsv(jnp.asarray(region_rgb))
    mask = in_range(hsv, jnp.asarray(hsv_range[0]), jnp.asarray(hsv_range[1]))
    return float(jnp.mean(mask) * 100.0)


def rescore_detections(
    image_rgb: np.ndarray,
    boxes: Sequence[tuple[float, float, float, float, float]],
    conf_threshold: float = 0.25,
    color_range=None,
) -> BallDetection | None:
    """Pick the best ball among (x1, y1, x2, y2, conf) boxes.

    Reference semantics (ball_drop.py:100-158): center/radius from the
    box, crop with 0.5*radius margin, Otsu + circularity 4πA/P², adjusted
    conf = conf * (0.5 + 0.5*circularity); with a color range, first scale
    by the color boost (>=30% colored pixels boosts up to 1.0, otherwise
    0.7 penalty — single_cam_drop.py:70-79, then the +0.2 circularity
    shaping of single_cam_drop.py:105).
    """
    img = np.asarray(image_rgb)
    H, W = img.shape[0], img.shape[1]
    best: BallDetection | None = None
    for x1, y1, x2, y2, conf in boxes:
        if conf <= conf_threshold:
            continue
        cx = (x1 + x2) / 2.0
        cy = (y1 + y2) / 2.0
        radius = ((x2 - x1) + (y2 - y1)) / 4.0
        margin = radius * 0.5
        cx1, cy1 = max(0, int(x1 - margin)), max(0, int(y1 - margin))
        cx2, cy2 = min(W, int(x2 + margin)), min(H, int(y2 + margin))
        if cx2 <= cx1 or cy2 <= cy1:
            continue
        region = img[cy1:cy2, cx1:cx2]
        if region.size == 0:
            continue

        adjusted = conf
        if color_range is not None:
            pct = color_fraction(region, color_range)
            if pct > 30.0:
                adjusted = conf * min(1.0, pct / 100.0 + 0.3)
            else:
                adjusted = conf * 0.7

        gray = rgb_to_gray(jnp.asarray(region))
        circ = float(region_circularity(gray))
        if color_range is not None:
            adjusted = adjusted * min(1.0, circ + 0.2)
        else:
            adjusted = adjusted * (0.5 + 0.5 * circ)

        if best is None or adjusted > best.confidence:
            best = BallDetection(cx, cy, radius, adjusted)
    return best


def depth_from_apparent_size(
    diameter_px: float, known_diameter_mm: float, focal_px: float
) -> float:
    """Monocular pinhole depth Z = D*f/d (single_cam_drop.py:330-340)."""
    return known_diameter_mm * focal_px / max(diameter_px, 1e-9)


def estimate_focal_length(
    diameter_px: float, known_distance_mm: float, known_diameter_mm: float
) -> float:
    """f = d_px * Z / D from one observation of a known object at a known
    distance (single_cam_drop.py:712-727)."""
    return diameter_px * known_distance_mm / max(known_diameter_mm, 1e-9)
