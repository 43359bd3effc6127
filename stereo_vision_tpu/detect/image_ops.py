"""Image primitives in pure JAX: color conversion, blur, thresholding.

TPU-native replacements for the cv2 C++ kernels the reference leans on
(SURVEY.md §2d): cvtColor (GRAY/HSV), GaussianBlur, Otsu threshold,
inRange, resize. All functions are jittable and vmappable over batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LUMA_RGB = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


@jax.jit
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB -> (..., H, W) BT.601 grayscale (cv2 weights)."""
    return img.astype(jnp.float32) @ _LUMA_RGB


@jax.jit
def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB uint8/float -> HSV in cv2's 8-bit ranges
    (H in [0,180), S,V in [0,255]) — matching cv2.cvtColor(BGR2HSV) after
    a BGR->RGB flip.
    """
    f = img.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, diff / jnp.maximum(v, 1e-12) * 255.0, 0.0)
    safe = jnp.maximum(diff, 1e-12)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 8-bit convention
    return jnp.stack([h, s, v], axis=-1)


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """cv2.getGaussianKernel-compatible taps."""
    if radius is None:
        radius = int(np.ceil(3.0 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jnp.ndarray, ksize: int = 5, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur on (H, W) or (H, W, C), replicate borders.

    ``sigma=0`` derives sigma from ksize as cv2 does:
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    radius = ksize // 2
    taps = jnp.asarray(gaussian_kernel_1d(sigma, radius))

    f = img.astype(jnp.float32)
    chan = f.ndim == 3

    def blur2d(x):
        xp = jnp.pad(x, ((radius, radius), (0, 0)), mode="edge")
        rows = jax.vmap(lambda c: jnp.convolve(c, taps, mode="valid"), in_axes=1, out_axes=1)(xp)
        rp = jnp.pad(rows, ((0, 0), (radius, radius)), mode="edge")
        return jax.vmap(lambda r: jnp.convolve(r, taps, mode="valid"))(rp)

    if chan:
        return jnp.stack([blur2d(f[..., c]) for c in range(f.shape[-1])], axis=-1)
    return blur2d(f)


@jax.jit
def otsu_threshold(img: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold of a (H, W) uint8-range image.

    Replaces cv2.threshold(..., THRESH_OTSU) (reference: ball_drop.py:133)
    with the histogram + between-class-variance argmax formulation — one
    256-bin reduction instead of a contour-based search.
    Returns the scalar threshold (float32).
    """
    flat = img.astype(jnp.int32).reshape(-1)
    hist = jnp.zeros(256, jnp.float32).at[jnp.clip(flat, 0, 255)].add(1.0)
    total = flat.shape[0]
    w = hist / total
    bins = jnp.arange(256, dtype=jnp.float32)
    omega = jnp.cumsum(w)                       # class-0 probability
    mu = jnp.cumsum(w * bins)                   # class-0 cumulative mean
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-12, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-12), 0.0)
    return bins[jnp.argmax(sigma_b)]


@jax.jit
def otsu_binarize(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image -> boolean foreground mask via Otsu (cv2 semantics:
    pixel > threshold)."""
    t = otsu_threshold(img)
    return img.astype(jnp.float32) > t


@jax.jit
def binary_erode(mask: jnp.ndarray) -> jnp.ndarray:
    """One round of 4-neighbor binary erosion (cv2.erode, cross kernel)."""
    p = jnp.pad(mask, 1)
    return (
        p[1:-1, 1:-1] & p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:]
    )


@jax.jit
def binary_dilate(mask: jnp.ndarray) -> jnp.ndarray:
    """One round of 4-neighbor binary dilation (cv2.dilate, cross kernel)."""
    p = jnp.pad(mask, 1)
    return (
        p[1:-1, 1:-1] | p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]
    )


@jax.jit
def in_range(img: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """cv2.inRange: per-channel lower <= img <= upper -> boolean mask."""
    f = img.astype(jnp.float32)
    lo = jnp.asarray(lower, jnp.float32)
    hi = jnp.asarray(upper, jnp.float32)
    return jnp.all((f >= lo) & (f <= hi), axis=-1)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (H, W[, C]) with cv2's half-pixel mapping."""
    H, W = img.shape[0], img.shape[1]
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (H / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (W / out_w) - 0.5
    map_y = jnp.clip(ys, 0, H - 1)[:, None] * jnp.ones((1, out_w), jnp.float32)
    map_x = jnp.ones((out_h, 1), jnp.float32) * jnp.clip(xs, 0, W - 1)[None, :]
    from stereo_vision_tpu.ops.remap import remap_bilinear

    return remap_bilinear(img, map_x, map_y)


@jax.jit
def sobel_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of a (H, W) image (edge strength for the
    Hough voting stage)."""
    f = img.astype(jnp.float32)
    pad = jnp.pad(f, 1, mode="edge")
    gx = (
        (pad[:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:])
        - (pad[:-2, :-2] + 2 * pad[1:-1, :-2] + pad[2:, :-2])
    )
    gy = (
        (pad[2:, :-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:])
        - (pad[:-2, :-2] + 2 * pad[:-2, 1:-1] + pad[:-2, 2:])
    )
    return jnp.sqrt(gx * gx + gy * gy), gx, gy
