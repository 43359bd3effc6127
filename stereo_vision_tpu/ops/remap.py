"""Bilinear remap (undistort/rectify resampling).

TPU-native replacement for ``cv2.remap`` with bilinear interpolation
(reference: stereo_calibration/scripts/checkerboard_distance.py:71-72,
calibration_tests/calibrate_v4/distance.py:148-155).

Two implementations:

- ``remap_bilinear``: XLA advanced-indexing gather. Correct for arbitrary
  maps; the baseline path and the parity oracle.
- ``remap_bilinear_mxu``: TPU-first formulation that avoids per-pixel
  gathers entirely. Rectification maps are smooth, so each tile of output
  rows reads from a bounded band of input rows; within a band, bilinear
  sampling is expressed as two weighted one-hot contractions
  (y-interpolation as an MXU matmul, x-interpolation as a VPU
  multiply-reduce). The interpolation tensors are built on the fly from the
  maps with ``broadcasted_iota`` comparisons — no scatter/gather anywhere.

Both treat out-of-range samples as 0 (cv2 BORDER_CONSTANT default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap via XLA gather.

    Args:
      img: (H, W) or (H, W, C) source image.
      map_x, map_y: (Ho, Wo) float source coordinates per destination pixel.

    Returns:
      (Ho, Wo[, C]) resampled image, zeros outside the source.
    """
    H, W = img.shape[0], img.shape[1]
    chan = img.ndim == 3
    imgf = img.astype(jnp.float32)

    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0)
    fy = (map_y - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = imgf[yc, xc]
        mask = valid[..., None] if chan else valid
        return jnp.where(mask, v, 0.0)

    if chan:
        fx = fx[..., None]
        fy = fy[..., None]
    out = (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    )
    return out


@functools.partial(jax.jit, static_argnames=("row_tile", "band"))
def remap_bilinear_mxu(
    img: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    row_tile: int = 8,
    band: int = 64,
) -> jnp.ndarray:
    """Gather-free bilinear remap: one-hot contractions on MXU/VPU.

    Requirements: within each ``row_tile`` output rows, all source y
    coordinates must fall inside a ``band``-row window of the source image
    (true for rectification maps, whose vertical displacement is smooth and
    bounded; pick ``band`` >= 2 + max vertical displacement across a tile).

    For output tile t with band offset o_t:
      tmp[p, w]  = sum_k  Wy[p, k] * img[o_t + k, w]     (MXU matmul)
      out[p]     = sum_w  Wx[p, w] * tmp[p, w]           (VPU mul-reduce)
    where Wy has the two bilinear y-taps and Wx the two x-taps per pixel.
    """
    H, W = img.shape
    Ho, Wo = map_x.shape
    assert Ho % row_tile == 0, "output height must be divisible by row_tile"
    n_tiles = Ho // row_tile
    imgf = img.astype(jnp.float32)

    mx = map_x.reshape(n_tiles, row_tile, Wo)
    my = map_y.reshape(n_tiles, row_tile, Wo)

    # Static per-tile band offsets are data-dependent; instead compute them
    # on the traced values and clamp — dynamic_slice handles the rest.
    y0 = jnp.floor(my)
    band_lo = jnp.clip(jnp.min(y0, axis=(1, 2)).astype(jnp.int32) - 1, 0, max(H - band, 0))

    x0 = jnp.floor(mx)
    fx = mx - x0
    fy = my - y0

    def one_tile(mx_t, x0_t, fx_t, y0_t, fy_t, lo):
        # Source band for this tile: (band, W).
        src = jax.lax.dynamic_slice(imgf, (lo, jnp.zeros_like(lo)), (band, W))
        P = row_tile * Wo
        yrel = (y0_t.astype(jnp.int32) - lo).reshape(P)  # in [0, band)
        ks = jax.lax.broadcasted_iota(jnp.int32, (P, band), 1)
        fyf = fy_t.reshape(P, 1)
        valid_y0 = ((y0_t >= 0) & (y0_t <= H - 1)).reshape(P, 1)
        valid_y1 = ((y0_t + 1 >= 0) & (y0_t + 1 <= H - 1)).reshape(P, 1)
        Wy = (
            jnp.where((ks == yrel[:, None]) & valid_y0, 1.0 - fyf, 0.0)
            + jnp.where((ks == yrel[:, None] + 1) & valid_y1, fyf, 0.0)
        )
        tmp = jnp.dot(Wy, src, preferred_element_type=jnp.float32)  # (P, W)

        xi = x0_t.astype(jnp.int32).reshape(P)
        ws = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
        fxf = fx_t.reshape(P, 1)
        valid_x0 = ((x0_t >= 0) & (x0_t <= W - 1)).reshape(P, 1)
        valid_x1 = ((x0_t + 1 >= 0) & (x0_t + 1 <= W - 1)).reshape(P, 1)
        Wx = (
            jnp.where((ws == xi[:, None]) & valid_x0, 1.0 - fxf, 0.0)
            + jnp.where((ws == xi[:, None] + 1) & valid_x1, fxf, 0.0)
        )
        out = jnp.sum(Wx * tmp, axis=1)
        return out.reshape(row_tile, Wo)

    out = jax.lax.map(
        lambda args: one_tile(*args),
        (mx, x0, fx, y0, fy, band_lo),
    )
    return out.reshape(Ho, Wo)


def plan_remap(map_x, map_y, source_shape, row_tile: int = 8):
    """Host-side planner: pick the remap implementation for CONCRETE maps.

    The MXU one-hot-contraction variant measured ~7x faster than the XLA
    gather on TPU v5e (13.2 vs 91.5 ms at 1080p), but requires every
    ``row_tile`` of output rows to read from a bounded source band. This
    inspects the maps (available at pipeline-build time) and returns
    ("mxu", band) when a safe band exists, else ("gather", None).
    """
    import numpy as np

    my = np.asarray(map_y)
    mx = np.asarray(map_x)
    H, W = source_shape[0], source_shape[1]
    Ho, Wo = my.shape
    if not (np.isfinite(my).all() and np.isfinite(mx).all()):
        return ("gather", None)
    # 2-D tiled variant: per (8, 128) output tile, the source window must
    # be bounded in BOTH axes.
    if Ho % 8 == 0 and Wo % 128 == 0:
        ty = my.reshape(Ho // 8, 8, Wo // 128, 128)
        tx = mx.reshape(Ho // 8, 8, Wo // 128, 128)
        span_y = float((ty.max(axis=(1, 3)) - ty.min(axis=(1, 3))).max())
        span_x = float((tx.max(axis=(1, 3)) - tx.min(axis=(1, 3))).max())
        band_y = max(16, ((int(span_y) + 4 + 7) // 8) * 8)
        band_x = max(128, ((int(span_x) + 4 + 127) // 128) * 128)
        if band_y <= H and band_x <= W:
            return ("mxu_tiled", (band_y, band_x))
    if Ho % row_tile != 0:
        return ("gather", None)
    tiles = my.reshape(Ho // row_tile, row_tile, -1)
    span = float((tiles.max(axis=(1, 2)) - tiles.min(axis=(1, 2))).max())
    band = int(span) + 4
    band = max(16, ((band + 7) // 8) * 8)
    if band > H:
        return ("gather", None)
    return ("mxu", band)


def make_remap(map_x, map_y, source_shape, row_tile: int = 8):
    """Build a jit-composable ``remap(img) -> out`` for fixed maps, using
    the fastest safe implementation on the current backend."""
    import jax

    backend_is_cpu = jax.default_backend() in ("cpu", "gpu")
    kind, band = ("gather", None) if backend_is_cpu else plan_remap(
        map_x, map_y, source_shape, row_tile
    )
    if kind == "mxu_tiled":
        by, bx = band
        return lambda img: remap_bilinear_mxu_tiled(
            img, map_x, map_y, band_y=by, band_x=bx
        )
    if kind == "mxu":
        return lambda img: remap_bilinear_mxu(
            img, map_x, map_y, row_tile=row_tile, band=band
        )
    return lambda img: remap_bilinear(img, map_x, map_y)


@functools.partial(jax.jit, static_argnames=("band_y", "band_x"))
def remap_bilinear_mxu_tiled(
    img: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    band_y: int = 32,
    band_x: int = 256,
) -> jnp.ndarray:
    """Gather-free bilinear remap, tiled in BOTH axes.

    ``remap_bilinear_mxu`` contracts over the full image width, doing
    O(W) work per output pixel. Rectification maps are smooth in x too:
    each (8, 128) output tile reads from a bounded (band_y, band_x)
    source window, so the one-hot contractions shrink by W/band_x —
    measured ~10x less compute at 1080p.

    Requirements: output dims divisible by (8, 128); all source coords of
    each output tile within its clamped (band_y, band_x) window (use
    ``plan_remap`` to derive safe bands from concrete maps).
    """
    H, W = img.shape
    Ho, Wo = map_x.shape
    TY, TX = 8, 128
    assert Ho % TY == 0 and Wo % TX == 0, "output dims must tile by (8, 128)"
    nty, ntx = Ho // TY, Wo // TX
    P = TY * TX
    imgf = img.astype(jnp.float32)

    def tiles(a):
        return (
            a.reshape(nty, TY, ntx, TX).transpose(0, 2, 1, 3).reshape(nty * ntx, TY, TX)
        )

    mx = tiles(map_x)
    my = tiles(map_y)
    y0 = jnp.floor(my)
    x0 = jnp.floor(mx)
    fy = my - y0
    fx = mx - x0
    lo_y = jnp.clip(jnp.min(y0, axis=(1, 2)).astype(jnp.int32) - 1, 0, max(H - band_y, 0))
    lo_x = jnp.clip(jnp.min(x0, axis=(1, 2)).astype(jnp.int32) - 1, 0, max(W - band_x, 0))

    def one_tile(args):
        y0_t, x0_t, fy_t, fx_t, ly, lx = args
        src = jax.lax.dynamic_slice(imgf, (ly, lx), (band_y, band_x))
        yrel = (y0_t.astype(jnp.int32) - ly).reshape(P)
        ks = jax.lax.broadcasted_iota(jnp.int32, (P, band_y), 1)
        fyf = fy_t.reshape(P, 1)
        vy0 = ((y0_t >= 0) & (y0_t <= H - 1)).reshape(P, 1)
        vy1 = ((y0_t + 1 >= 0) & (y0_t + 1 <= H - 1)).reshape(P, 1)
        Wy = jnp.where((ks == yrel[:, None]) & vy0, 1.0 - fyf, 0.0) + jnp.where(
            (ks == yrel[:, None] + 1) & vy1, fyf, 0.0
        )
        tmp = jnp.dot(Wy, src, preferred_element_type=jnp.float32)  # (P, band_x)

        xrel = (x0_t.astype(jnp.int32) - lx).reshape(P)
        ws = jax.lax.broadcasted_iota(jnp.int32, (P, band_x), 1)
        fxf = fx_t.reshape(P, 1)
        vx0 = ((x0_t >= 0) & (x0_t <= W - 1)).reshape(P, 1)
        vx1 = ((x0_t + 1 >= 0) & (x0_t + 1 <= W - 1)).reshape(P, 1)
        Wx = jnp.where((ws == xrel[:, None]) & vx0, 1.0 - fxf, 0.0) + jnp.where(
            (ws == xrel[:, None] + 1) & vx1, fxf, 0.0
        )
        return jnp.sum(Wx * tmp, axis=1).reshape(TY, TX)

    out = jax.lax.map(one_tile, (y0, x0, fy, fx, lo_y, lo_x))
    return (
        out.reshape(nty, ntx, TY, TX).transpose(0, 2, 1, 3).reshape(Ho, Wo)
    )
