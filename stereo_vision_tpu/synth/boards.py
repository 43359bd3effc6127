"""Checkerboard renderers + adversarial degradations (robustness suite).

The reference's calibration detector is battle-tested on real footage
via cv2's quad-filtering pipeline plus a blur retry
(/root/reference/stereo_calibration/scripts/intrinsic.py:148-163); the
jax detector (detect/checkerboard.py) passes hard-pose synthetic tests
but round-2's verdict asked for *quantified* robustness evidence: where
does the jax backend lose to cv2, and how often does the 'auto' fallback
fire? This module renders boards under controlled degradations — sensor
noise, motion blur, specular glare, partial occlusion, extreme
foreshortening, low contrast — with tracked ground-truth corners, so
benchmarks/checkerboard_robustness.py can score both backends and
docs/checkerboard_robustness.md can pin the table.
"""

from __future__ import annotations

import numpy as np


def render_board(
    cols: int,
    rows: int,
    square_px: int = 40,
    margin: int = 60,
    white: int = 255,
    black: int = 0,
):
    """Axis-aligned checkerboard; returns (uint8 image, (N, 2) inner-corner
    GT in pixel-centre coordinates — corners sit on pixel boundaries, i.e.
    at k - 0.5)."""
    w = (cols + 1) * square_px + 2 * margin
    h = (rows + 1) * square_px + 2 * margin
    img = np.full((h, w), white, np.uint8)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                y0 = margin + i * square_px
                x0 = margin + j * square_px
                img[y0 : y0 + square_px, x0 : x0 + square_px] = black
    gt = np.array(
        [
            [margin + (j + 1) * square_px - 0.5, margin + (i + 1) * square_px - 0.5]
            for i in range(rows)
            for j in range(cols)
        ],
        np.float64,
    )
    return img, gt


def warp_perspective(img: np.ndarray, gt: np.ndarray, tilt: float, rng):
    """Projective foreshortening: ``tilt`` in [0, 1) pulls the top edge
    inward (tilt 0.35 ~ a board at 60 deg+ to the camera axis)."""
    import cv2

    h, w = img.shape
    jx = rng.uniform(-0.05, 0.05)
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = np.float32(
        [
            [w * (tilt + jx), h * 0.08],
            [w * (1 - tilt + jx), h * 0.08],
            [w * 0.98, h * 0.95],
            [w * 0.02, h * 0.95],
        ]
    )
    H = cv2.getPerspectiveTransform(src, dst)
    out = cv2.warpPerspective(img, H, (w, h), borderValue=255)
    gt_h = np.c_[gt, np.ones(len(gt))] @ H.T
    return out, gt_h[:, :2] / gt_h[:, 2:3]


def rotate(img: np.ndarray, gt: np.ndarray, angle_deg: float):
    import cv2

    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, 1.0)
    out = cv2.warpAffine(img, M, (w, h), borderValue=255)
    return out, np.c_[gt, np.ones(len(gt))] @ M.T


def add_noise(img: np.ndarray, sigma: float, rng) -> np.ndarray:
    x = img.astype(np.float32) + rng.normal(0, sigma, img.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def motion_blur(img: np.ndarray, length: int, angle_deg: float) -> np.ndarray:
    """Directional box blur of ``length`` pixels (camera shake / motion)."""
    import cv2

    k = np.zeros((length, length), np.float32)
    k[length // 2] = 1.0
    M = cv2.getRotationMatrix2D((length / 2 - 0.5, length / 2 - 0.5), angle_deg, 1.0)
    k = cv2.warpAffine(k, M, (length, length))
    k /= max(k.sum(), 1e-9)
    return cv2.filter2D(img, -1, k)


def add_glare(img: np.ndarray, rng, n_spots: int = 2, strength: float = 200.0) -> np.ndarray:
    """Additive specular highlights: broad Gaussian blobs that locally
    saturate the board (lighting/lacquer reflections)."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = img.astype(np.float32)
    for _ in range(n_spots):
        cy = rng.uniform(0.2 * h, 0.8 * h)
        cx = rng.uniform(0.2 * w, 0.8 * w)
        s = rng.uniform(0.06, 0.14) * max(h, w)
        out += strength * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return np.clip(out, 0, 255).astype(np.uint8)


def occlude(img: np.ndarray, gt: np.ndarray, rng, frac: float = 0.12) -> np.ndarray:
    """Cover a patch of the board MARGIN/outer squares with a gray blob
    (a hand or cable). Inner corners stay visible — full detection must
    remain possible (cv2 also requires every inner corner visible)."""
    import cv2

    h, w = img.shape
    out = img.copy()
    x0, y0 = gt.min(axis=0)
    x1, y1 = gt.max(axis=0)
    # blob centre outside the inner-corner hull but touching the board
    side = rng.integers(0, 4)
    r = int(frac * max(h, w))
    safety = r + 12  # keep every inner corner's subpixel window clear
    if side == 0:
        cx, cy = rng.uniform(x0, x1), y0 - safety
    elif side == 1:
        cx, cy = rng.uniform(x0, x1), y1 + safety
    elif side == 2:
        cx, cy = x0 - safety, rng.uniform(y0, y1)
    else:
        cx, cy = x1 + safety, rng.uniform(y0, y1)
    cv2.circle(out, (int(cx), int(cy)), r, 128, -1, cv2.LINE_AA)
    return out


def low_contrast(img: np.ndarray, lo: int = 100, hi: int = 165) -> np.ndarray:
    return (lo + (img.astype(np.float32) / 255.0) * (hi - lo)).astype(np.uint8)


def degraded_board(kind: str, seed: int, cols: int = 7, rows: int = 4):
    """One (image, gt) sample of the named degradation class."""
    rng = np.random.default_rng(seed)
    img, gt = render_board(cols, rows, square_px=40, margin=70)
    angle = rng.uniform(-25, 25)
    img, gt = rotate(img, gt, angle)

    if kind == "clean":
        pass
    elif kind == "noise":
        img = add_noise(img, 18.0, rng)
    elif kind == "blur":
        img = motion_blur(img, 9, rng.uniform(0, 180))
    elif kind == "blur_heavy":
        img = motion_blur(img, 15, rng.uniform(0, 180))
    elif kind == "glare":
        img = add_glare(img, rng)
    elif kind == "occlusion":
        img = occlude(img, gt, rng)
    elif kind == "foreshorten":
        img, gt2 = warp_perspective(img, gt, 0.32, rng)
        gt = gt2
    elif kind == "low_contrast_noise":
        img = add_noise(low_contrast(img), 10.0, rng)
    elif kind == "combined":
        img, gt = warp_perspective(img, gt, 0.22, rng)
        img = motion_blur(img, 7, rng.uniform(0, 180))
        img = add_noise(img, 8.0, rng)
    else:
        raise ValueError(f"unknown degradation {kind!r}")
    return img, gt


DEGRADATIONS = (
    "clean", "noise", "blur", "blur_heavy", "glare", "occlusion",
    "foreshorten", "low_contrast_noise", "combined",
)
