"""Block-matching dense stereo (cv2.StereoBM parity) in pure JAX.

This is a capability extension over the reference (which has no dense
stereo — SURVEY.md §0); parity target is cv2.StereoBM per
/root/repo/BASELINE.json config #1 (640x480, numDisparities=64,
blockSize=15).

Algorithm (matches OpenCV's findStereoCorrespondenceBM semantics):
  1. X-Sobel prefilter clipped to [0, 2*prefilter_cap].
  2. SAD cost volume over a blockSize window, all disparities at once
     (the per-pixel scalar loop of the CPU implementation becomes one
     batched (D, H, W) tensor program — integral-image box sums).
  3. Texture threshold, winner-take-all, uniqueness ratio check,
     subpixel refinement with OpenCV's modified-parabola formula.

Everything is jittable, vmappable over a batch of frame pairs, and
shardable over a device mesh (see stereo_vision_tpu.parallel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StereoBMParams(NamedTuple):
    num_disparities: int = 64
    block_size: int = 15
    min_disparity: int = 0
    prefilter_cap: int = 31
    texture_threshold: int = 10
    uniqueness_ratio: int = 15
    backend: str = "auto"  # "auto" | "xla" | "pallas"


def prefilter_xsobel(img: jnp.ndarray, cap: int = 31) -> jnp.ndarray:
    """OpenCV BM x-Sobel prefilter: clip(sobel_x + cap, 0, 2*cap).

    Border columns are set to ``cap`` (the zero-response value), border rows
    use replicated neighbors — matching cv2's prefilterXSobel.
    """
    img = img.astype(jnp.int32)
    up = jnp.concatenate([img[:1], img[:-1]], axis=0)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    up_l = jnp.concatenate([up[:, :1], up[:, :-1]], axis=1)
    up_r = jnp.concatenate([up[:, 1:], up[:, -1:]], axis=1)
    dn_l = jnp.concatenate([down[:, :1], down[:, :-1]], axis=1)
    dn_r = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    d0 = up_r - up_l
    d1 = right - left
    d2 = dn_r - dn_l
    v = jnp.clip(d0 + 2 * d1 + d2 + cap, 0, 2 * cap)
    # First/last columns: zero-response value.
    v = v.at[:, 0].set(cap).at[:, -1].set(cap)
    return v


def _box_sum_valid(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Exact integer box sum over a bs x bs window; 'valid' output size.

    (..., H, W) -> (..., H-bs+1, W-bs+1) via bs static-shift adds per axis
    (fuses to one pass per axis on TPU; cumsum would lower to O(log n)
    full-volume passes).
    """
    Ho = x.shape[-2] - bs + 1
    Wo = x.shape[-1] - bs + 1
    y = x[..., 0:Ho, :]
    for k in range(1, bs):
        y = y + x[..., k : k + Ho, :]
    out = y[..., :, 0:Wo]
    for k in range(1, bs):
        out = out + y[..., :, k : k + Wo]
    return out


def _sad_cost_volume(lp: jnp.ndarray, rp: jnp.ndarray, ndisp: int, mindisp: int, bs: int) -> jnp.ndarray:
    """(D, H', W') SAD cost volume on prefiltered images ('valid' spatial size).

    cost[d, y, x] = window SAD between left at x and right at x - (mindisp+d),
    where (y, x) index window centers offset by bs//2.
    """
    H, W = lp.shape
    maxd = mindisp + ndisp - 1
    # Pad right image on the left so every shift is a static slice.
    rp_pad = jnp.pad(rp, ((0, 0), (maxd, 0)))

    def per_d(d):
        shifted = jax.lax.dynamic_slice(rp_pad, (0, maxd - (mindisp + d)), (H, W))
        return jnp.abs(lp - shifted)

    diffs = jax.vmap(per_d)(jnp.arange(ndisp))  # (D, H, W)
    return _box_sum_valid(diffs, bs)  # (D, H', W')


def stereo_bm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoBMParams = StereoBMParams(),
) -> jnp.ndarray:
    """Dense block-matching disparity (cv2.StereoBM parity).

    Args:
      left, right: (H, W) uint8/int grayscale rectified pair.
      params: StereoBMParams.

    Returns:
      (H, W) float32 disparity; invalid pixels are ``min_disparity - 1``
      (cv2's FILTERED convention after the /16 fixed-point scale).
    """
    ndisp = params.num_disparities
    mindisp = params.min_disparity
    bs = params.block_size
    wsz2 = bs // 2
    H, W = left.shape

    lp = prefilter_xsobel(left, params.prefilter_cap)
    rp = prefilter_xsobel(right, params.prefilter_cap)

    backend = params.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if backend == "pallas" and mindisp == 0:
        return _stereo_bm_pallas(lp, rp, params, H, W)

    cost = _sad_cost_volume(lp, rp, ndisp, mindisp, bs)  # (D, H', W')
    Hp, Wp = cost.shape[1], cost.shape[2]

    mind = jnp.argmin(cost, axis=0)  # (H', W') — ties -> smallest d, as cv2
    minsad = jnp.min(cost, axis=0)

    # Texture check: window sum of |prefiltered - cap| on the left image.
    tex = _box_sum_valid(jnp.abs(lp - params.prefilter_cap), bs)
    tex_ok = tex >= params.texture_threshold

    # Uniqueness: any d with cost <= minsad + minsad*ratio//100 and |d-mind|>1
    # invalidates the pixel (cv2 integer arithmetic).
    thresh = minsad + (minsad * params.uniqueness_ratio) // 100
    ds = jnp.arange(ndisp).reshape(ndisp, 1, 1)
    offender = (cost <= thresh[None]) & (jnp.abs(ds - mind[None]) > 1)
    unique_ok = ~jnp.any(offender, axis=0)

    # Subpixel: OpenCV's modified parabola on the integer SADs.
    d0 = jnp.clip(mind, 1, ndisp - 2)
    take = lambda idx: jnp.take_along_axis(cost, idx[None], axis=0)[0]
    c0 = take(d0)
    cn = take(d0 - 1)  # cost at disparity-1
    cp = take(d0 + 1)  # cost at disparity+1
    # cv2's modified parabola (its SAD array is disparity-reversed, hence the
    # (cn - cp) orientation here): delta = (c[d-1] - c[d+1]) / denom.
    denom = cp + cn - 2 * c0 + jnp.abs(cp - cn)
    delta = jnp.where(denom != 0, (cn - cp) / denom, 0.0)
    delta = jnp.where((mind > 0) & (mind < ndisp - 1), delta, 0.0)
    disp = (mind + mindisp).astype(jnp.float32) + delta.astype(jnp.float32)

    # Left margin: the full disparity range must be in-frame for the whole
    # window (cv2 region: x >= minDisparity + numDisparities - 1 + wsz2).
    xs = jnp.arange(Wp).reshape(1, Wp) + wsz2
    range_ok = (xs - wsz2 - (mindisp + ndisp - 1)) >= 0

    valid = tex_ok & unique_ok & range_ok
    invalid_val = jnp.float32(mindisp - 1)
    disp = jnp.where(valid, disp, invalid_val)

    # Paste the 'valid' window-center region back into full-frame coordinates.
    full = jnp.full((H, W), invalid_val, jnp.float32)
    full = jax.lax.dynamic_update_slice(full, disp, (wsz2, wsz2))
    return full


stereo_bm_jit = jax.jit(stereo_bm, static_argnames=("params",))


def _stereo_bm_pallas(lp, rp, params: StereoBMParams, H: int, W: int) -> jnp.ndarray:
    """Fully-fused single-pass BM (stereo_vision_tpu.stereo.bm_pallas):
    the cost volume never reaches HBM. Bit-equal to the XLA path (tested
    in interpret mode on CPU)."""
    from stereo_vision_tpu.stereo.bm_pallas import bm_stats_pallas

    ndisp = params.num_disparities
    bs = params.block_size
    wsz2 = bs // 2
    disp_v, ok_v = bm_stats_pallas(
        lp,
        rp,
        ndisp=ndisp,
        block_size=bs,
        cap=params.prefilter_cap,
        uniq=params.uniqueness_ratio,
        tex_thr=params.texture_threshold,
    )
    Hv = H - bs + 1
    Wv = W - bs + 1
    disp = disp_v[:, :Wv]
    ok = ok_v[:, :Wv] > 0.5
    # Left margin: the full disparity range must be in-frame
    # (cv2: x >= minDisparity + numDisparities - 1 + wsz2).
    xs = jnp.arange(Wv).reshape(1, Wv) + wsz2
    range_ok = (xs - wsz2 - (ndisp - 1)) >= 0
    invalid_val = jnp.float32(-1.0)
    out_v = jnp.where(ok & range_ok, disp, invalid_val)
    full = jnp.full((H, W), invalid_val, jnp.float32)
    return jax.lax.dynamic_update_slice(full, out_v, (wsz2, wsz2))
