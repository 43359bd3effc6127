"""Circle detection and shape scoring on TPU.

Replaces the reference's contour-walk circle machinery
(cv2.HoughCircles at archive/auto_validate.py:135-144, contour
circularity at ball_drop.py:130-153, minEnclosingCircle at
roboflow_ball_detector.py:274-283) with convolution/moment formulations:

- Hough circle voting: for each candidate radius, the accumulator is the
  2D convolution of the edge map with a circle-ring kernel — an
  XLA-fused conv per radius plane instead of a per-edge-pixel scatter.
- Circularity 4πA/P²: mask area is a sum; the perimeter is the count of
  boundary pixels (mask xor erosion), matching the contour arc length to
  within discretization.
- Min enclosing circle: from mask moments (centroid + max radius).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.detect.image_ops import otsu_binarize, sobel_magnitude


class Circle(NamedTuple):
    cx: float
    cy: float
    radius: float
    score: float


def _ring_kernel(radius: int, thickness: float = 1.0) -> np.ndarray:
    """(2r+1, 2r+1) ring of ones at distance ``radius`` from the center."""
    r = int(radius)
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    d = np.sqrt(ys**2 + xs**2)
    ring = (np.abs(d - radius) <= thickness).astype(np.float32)
    n = ring.sum()
    return ring / max(n, 1.0)


@functools.partial(jax.jit, static_argnames=("radii",))
def hough_accumulator(edges: jnp.ndarray, radii: tuple[int, ...]) -> jnp.ndarray:
    """(R, H, W) Hough vote maps: accumulator[r] = edges ⊛ ring_r.

    ``edges`` is a float edge-strength map (H, W). Each radius plane is an
    independent conv, so XLA batches them onto the MXU.
    """
    H, W = edges.shape
    e = edges.astype(jnp.float32)[None, None]  # NCHW
    outs = []
    for r in radii:
        k = jnp.asarray(_ring_kernel(r))[None, None]
        acc = jax.lax.conv_general_dilated(
            e, k, window_strides=(1, 1), padding="SAME"
        )[0, 0]
        outs.append(acc)
    return jnp.stack(outs)


def hough_circles(
    img: jnp.ndarray,
    min_radius: int = 10,
    max_radius: int = 100,
    radius_step: int = 2,
    edge_threshold: float = 100.0,
    vote_threshold: float = 0.25,
    min_dist: int = 100,
    max_circles: int = 4,
) -> list[Circle]:
    """Circle detection with cv2.HoughCircles-like behavior
    (dp=1, minDist default 100 per archive/auto_validate.py:135-144).

    Returns up to ``max_circles`` circles sorted by vote score, greedily
    suppressing centers within ``min_dist``.
    """
    mag, _, _ = sobel_magnitude(jnp.asarray(img))
    edges = (mag > edge_threshold).astype(jnp.float32)
    radii = tuple(range(min_radius, max_radius + 1, radius_step))
    acc = np.asarray(hough_accumulator(edges, radii))  # (R, H, W)

    best_r = acc.argmax(axis=0)
    best_v = acc.max(axis=0)
    found: list[Circle] = []
    flat = best_v.ravel().argsort()[::-1]
    H, W = best_v.shape
    for idx in flat[: 50 * max_circles]:
        v = best_v.ravel()[idx]
        if v < vote_threshold:
            break
        cy, cx = divmod(int(idx), W)
        if any((cx - c.cx) ** 2 + (cy - c.cy) ** 2 < min_dist**2 for c in found):
            continue
        found.append(Circle(float(cx), float(cy), float(radii[best_r[cy, cx]]), float(v)))
        if len(found) >= max_circles:
            break
    return found


@jax.jit
def mask_circularity(mask: jnp.ndarray) -> jnp.ndarray:
    """4πA/P² of a boolean mask (reference formula at ball_drop.py:143).

    Perimeter = boundary pixel count (mask minus its 4-neighborhood
    erosion), the moment-based stand-in for cv2.arcLength on the largest
    contour.
    """
    m = mask.astype(jnp.float32)
    area = jnp.sum(m)
    pad = jnp.pad(m, 1)
    eroded = (
        pad[1:-1, 1:-1]
        * pad[:-2, 1:-1]
        * pad[2:, 1:-1]
        * pad[1:-1, :-2]
        * pad[1:-1, 2:]
    )
    perimeter = jnp.sum(m - eroded)
    return jnp.where(
        perimeter > 0, 4.0 * jnp.pi * area / (perimeter * perimeter), 0.0
    )


@jax.jit
def largest_component_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Restrict a boolean mask to its largest 4-connected component.

    The reference picks ``max(contours, key=cv2.contourArea)`` before
    scoring circularity (roboflow_ball_detector.py:274-283); this is the
    mask-space equivalent, reusing the stereo speckle filter's
    pointer-jumping labeler so scattered same-color noise pixels cannot
    dilute the moments of the actual blob.
    """
    from stereo_vision_tpu.stereo.postprocess import connected_component_labels

    H, W = mask.shape
    adjacency = []
    pad = jnp.pad(mask, 1)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nb = pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
        adjacency.append(mask & nb)
    labels = connected_component_labels(adjacency, mask)
    counts = jnp.zeros(H * W, jnp.int32).at[labels.ravel()].add(
        mask.ravel().astype(jnp.int32)
    )
    best = jnp.argmax(counts)
    return mask & (labels == best)


@jax.jit
def min_enclosing_circle(mask: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, r) of a boolean mask: centroid + max distance to a set pixel
    (cv2.minEnclosingCircle stand-in, roboflow_ball_detector.py:274-283)."""
    m = mask.astype(jnp.float32)
    H, W = m.shape
    total = jnp.maximum(jnp.sum(m), 1e-9)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    cy = jnp.sum(m * ys) / total
    cx = jnp.sum(m * xs) / total
    d = jnp.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
    r = jnp.max(jnp.where(m > 0, d, 0.0))
    return jnp.stack([cx, cy, r])


@jax.jit
def otsu_foreground(gray_region: jnp.ndarray) -> jnp.ndarray:
    """Otsu-binarize a crop and pick the foreground polarity as the side
    with the smaller border contact (balls rarely touch the crop border)."""
    fg = otsu_binarize(gray_region)
    border = (
        jnp.sum(fg[0]) + jnp.sum(fg[-1]) + jnp.sum(fg[:, 0]) + jnp.sum(fg[:, -1])
    )
    border_inv = (
        jnp.sum(~fg[0]) + jnp.sum(~fg[-1]) + jnp.sum(~fg[:, 0]) + jnp.sum(~fg[:, -1])
    )
    return jnp.where(border > border_inv, ~fg, fg)


@jax.jit
def region_circularity(gray_region: jnp.ndarray) -> jnp.ndarray:
    """Otsu-binarize a grayscale crop and score its circularity — the
    reference's rescoring step (ball_drop.py:130-147) without the contour
    walk."""
    return mask_circularity(otsu_foreground(gray_region))
