"""Hosted-API ball detector client with offline transport.

Rebuilds the reference's Roboflow detector pipeline (reference:
scripts/archive/roboflow_ball_detector.py:161-300): hosted-model
prediction -> image-hash result cache -> ball-color HSV gating ->
contour-circularity refinement via minEnclosingCircle -> size gate.

This environment has no network egress, so the HTTP call is abstracted
as a ``transport`` callable returning predictions in the hosted API's
JSON schema ({"x", "y", "width", "height", "confidence"} in pixels,
centers + sizes). Two transports ship:

- ``local_transport()`` — the in-repo YOLOv8 detector standing in for
  the hosted model (same schema), so the full chain runs offline.
- any user callable hitting a real endpoint (requests is trivially
  pluggable where egress exists).

The post-prediction chain is TPU-friendly jax image math (HSV in_range,
moment circularity, mask-based minEnclosingCircle) instead of the
reference's contour walks.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Sequence

import numpy as np

from stereo_vision_tpu.detect.ball import BallDetection, color_fraction
from stereo_vision_tpu.detect.cache import DetectionCache

# Reference blue-ball HSV range (roboflow_ball_detector.py:206-214),
# in OpenCV HSV scaling (H in [0, 180)).
ROBOFLOW_BLUE_HSV_RANGE = ((100, 50, 50), (130, 255, 255))

Prediction = dict
Transport = Callable[[np.ndarray], Sequence[Prediction]]


def local_transport(score_threshold: float = 0.3) -> Transport:
    """A hosted-API stand-in backed by the in-repo YOLOv8 weights.

    Returns predictions in the hosted schema so the client code path is
    identical to a real endpoint's.
    """
    from stereo_vision_tpu.models.pretrained import detect_balls_in_frames

    def call(image: np.ndarray) -> list[Prediction]:
        det = detect_balls_in_frames(image[None], score_threshold=score_threshold)[0]
        if det is None:
            return []
        return [
            {
                "x": det.cx,
                "y": det.cy,
                "width": det.radius * 2,
                "height": det.radius * 2,
                "confidence": det.confidence,
            }
        ]

    return call


def _refine_circle(
    region_rgb: np.ndarray, hsv_range=None
) -> tuple[float, float, float] | None:
    """Circularity-gated minEnclosingCircle refinement of a ball crop
    (roboflow_ball_detector.py:274-283), via mask moments instead of a
    contour walk. Returns (cx, cy, radius) in region coords or None.

    The segmentation mask is the ball-color in_range mask when a color
    range is configured (the reference's fixed gray threshold of 100
    assumes dark-ball/bright-background footage; the color mask is the
    robust equivalent on arbitrary backgrounds), falling back to an
    Otsu split with border-contact polarity selection.
    """
    import jax.numpy as jnp

    from stereo_vision_tpu.detect.circles import (
        largest_component_mask,
        mask_circularity,
        min_enclosing_circle,
        otsu_foreground,
    )
    from stereo_vision_tpu.detect.image_ops import (
        binary_dilate,
        binary_erode,
        in_range,
        rgb_to_hsv,
    )

    mask = None
    if hsv_range is not None:
        hsv = rgb_to_hsv(jnp.asarray(region_rgb))
        cmask = in_range(hsv, jnp.asarray(hsv_range[0]), jnp.asarray(hsv_range[1]))
        if float(jnp.sum(cmask)) >= 100:
            mask = cmask
    if mask is None:
        mask = otsu_foreground(jnp.asarray(region_rgb.astype(np.float32).mean(-1)))

    # The reference scores max(contours, key=contourArea) — an isolated
    # blob, not the union of mask pixels. Sweep a morphological opening
    # radius (erode^k -> largest component -> dilate^k, constrained to the
    # mask): k=0 matches a clean mask unchanged; larger k shears off noise
    # tendrils fusing the ball to background speckle. Keep the most
    # circular blob across the sweep, gated by the reference rules
    # (contourArea >= 100, circularity > 0.7).
    max_k = max(2, min(region_rgb.shape[:2]) // 24)
    best = None
    best_circ = 0.7  # reference circularity rule: must exceed this
    eroded = mask
    for k in range(max_k + 1):
        m = largest_component_mask(eroded)
        for _ in range(k):
            m = binary_dilate(m)
        m = m & mask
        if float(jnp.sum(m)) >= 100:  # reference's contourArea < 100 gate
            circ = float(mask_circularity(m))
            if circ > best_circ:
                best_circ, best = circ, m
        eroded = binary_erode(eroded)
    if best is None:
        return None
    cx, cy, r = (float(v) for v in np.asarray(min_enclosing_circle(best)))
    return cx, cy, r


class HostedDetectorClient:
    """Cached hosted-model ball detector with color + circularity gating.

    Args:
      transport: prediction callable (see module docstring).
      cache_path: optional DetectionCache pickle path (image-hash keyed,
        like the reference's detection_cache persisted across runs).
      hsv_range: ball color gate; color percentage > ``color_min_percent``
        keeps a prediction in the color-filtered pool (reference's
        blue_percent > 10 rule).
      radius_range: plausible ball radius in px (reference: 10..300).
    """

    def __init__(
        self,
        transport: Transport,
        cache_path: str | Path | None = None,
        conf_threshold: float = 0.5,
        hsv_range=ROBOFLOW_BLUE_HSV_RANGE,
        color_min_percent: float = 10.0,
        radius_range: tuple[float, float] = (10.0, 300.0),
    ):
        self.transport = transport
        self.cache = DetectionCache(cache_path) if cache_path else None
        self.conf_threshold = conf_threshold
        self.hsv_range = hsv_range
        self.color_min_percent = color_min_percent
        self.radius_range = radius_range
        self.calls = 0  # transport invocations (cache hits skip these)

    # Cache entry marking "transport ran, nothing detected": no-ball
    # frames must not re-invoke a paid hosted endpoint on every pass.
    _NO_DETECTION = "no_detection"

    def detect(self, image: np.ndarray) -> BallDetection | None:
        """(H, W, 3) uint8 RGB frame -> best BallDetection or None."""
        if self.cache is not None:
            hit = self.cache.get(image)
            if hit is not None:
                return None if hit == self._NO_DETECTION else hit

        self.calls += 1
        preds = [
            p for p in self.transport(image)
            if p["confidence"] >= self.conf_threshold
        ]
        result = self._select(image, preds)
        if self.cache is not None:
            self.cache.put(image, self._NO_DETECTION if result is None else result)
        return result

    def _select(self, image: np.ndarray, preds: Sequence[Prediction]) -> BallDetection | None:
        H, W = image.shape[:2]

        def crop(cx, cy, half_w, half_h):
            x1, y1 = max(0, int(cx - half_w)), max(0, int(cy - half_h))
            x2, y2 = min(W, int(cx + half_w)), min(H, int(cy + half_h))
            return image[y1:y2, x1:x2], x1, y1

        # Color gate: prefer predictions whose box holds enough ball color.
        # hsv_range=None means "no color gate" (matching _refine_circle).
        colored = []
        if self.hsv_range is not None:
            for p in preds:
                region, _, _ = crop(p["x"], p["y"], p["width"] / 2, p["height"] / 2)
                if region.size and color_fraction(region, self.hsv_range) > self.color_min_percent:
                    colored.append(p)
        pool = colored or list(preds)
        if not pool:
            return None
        best = max(pool, key=lambda p: p["confidence"])
        cx, cy = float(best["x"]), float(best["y"])
        radius = (float(best["width"]) + float(best["height"])) / 4
        conf = float(best["confidence"])

        # Circularity refinement on a 1.5-radius crop (reference :245-283).
        region, x1, y1 = crop(cx, cy, radius * 1.5, radius * 1.5)
        if region.size:
            refined = _refine_circle(region, self.hsv_range)
            if refined is not None:
                rx, ry, rr = refined
                lo, hi = self.radius_range
                if lo <= rr <= hi:
                    return BallDetection(
                        cx=rx + x1, cy=ry + y1, radius=rr, confidence=conf
                    )
        lo, hi = self.radius_range
        if lo <= radius <= hi:
            return BallDetection(cx=cx, cy=cy, radius=radius, confidence=conf)
        return None

    def save_cache(self) -> None:
        if self.cache is not None:
            self.cache.save()
