"""Band-limited SGBM core: absolute-disparity semantics on a per-tile band.

The hierarchical mode (stereo_vision_tpu.stereo.hier) restricts the full
D-disparity search to a ``band``-lane window around a coarse prior. A
*warped-image* formulation was tried first and REJECTED by measurement:
the warp introduces seams where the shift map changes, and 31% of pixels
within 4 px of a seam disagreed with cv2 (vs 1.4% elsewhere) — residual-
space SGM charges P2 across seams even where the true disparity is
smooth. This module instead keeps every lane in ABSOLUTE disparity
coordinates: lane k at pixel p means disparity s(p) + k, and every
cross-pixel operation (box window, SGM carries) lane-ALIGNS its operands
by the shift-map difference first. With the shift map tile-constant
(tile >= block_size) and G-Lipschitz across tiles (hier.shift_map), all
alignment deltas are in {-G, 0, +G} ({-2G..2G} for diagonal carries) —
static lane shifts + selects, never a gather.

Alignment fill semantics (pinned by tests/test_hier.py):
  - box window: out-of-band lanes of a contributing pixel REPLICATE its
    band-edge cost (the information does not exist in the band; edge
    replication bounds the error and only band-edge lanes of windows
    crossing a tile boundary deviate from the full-D window),
  - SGM carries: out-of-band predecessor lanes get +inf, which makes
    their update candidate exactly ``minL + P2`` — the same value cv2
    assigns any lane far from the predecessor's winner, so banding is
    EXACT wherever the predecessor's winner lies inside the band;
  - a fully-misaligned predecessor (all lanes shifted out, only possible
    for diagonal carries when 2G >= band) resets to the border rule
    L = c.

This file is the lax.scan reference; the Pallas pack-4 kernels
(stereo/sgm_pack.py) are asserted bit-identical against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_vision_tpu.stereo.sgbm import (
    StereoSGBMParams,
    compute_pixel_cost,
    wta_scan,
)

_BIGF = jnp.int32(1 << 29)


def lane_shift(a: jnp.ndarray, d: int, fill=None) -> jnp.ndarray:
    """out[..., k] = a[..., k + d] (static d). fill=None replicates the
    band edge; otherwise the constant fill value is used."""
    if d == 0:
        return a
    B = a.shape[-1]

    def pad(n, edge):
        if fill is None:
            return jnp.broadcast_to(edge, a.shape[:-1] + (n,))
        return jnp.full(a.shape[:-1] + (n,), fill, a.dtype)

    if abs(d) >= B:
        return pad(B, a[..., -1:] if d > 0 else a[..., :1])
    if d > 0:
        return jnp.concatenate([a[..., d:], pad(d, a[..., -1:])], axis=-1)
    return jnp.concatenate([pad(-d, a[..., :1]), a[..., :d]], axis=-1)


def align_band(a: jnp.ndarray, delta: jnp.ndarray, G: int, *, diag: bool = False, fill=None) -> jnp.ndarray:
    """Re-index band lanes from a predecessor's coordinates into the
    current pixel's: out[..., k] = a[..., k + delta] with delta a
    per-pixel multiple of G. Supported shifts are {-G, 0, +G} (plus
    {-2G, +2G} when ``diag`` and they keep any overlap); larger deltas
    mean the bands do not overlap usefully:

      - fill=constant (SGM carries): the whole row becomes the fill, and
        ``_update_banded`` resets to the border rule L = c — information
        from a non-overlapping predecessor is genuinely unusable;
      - fill=None (window, replicate-clamp): the shift saturates at the
        largest supported delta.

    a: (..., B); delta: (...,) int32 (actual lane delta, multiple of G).
    """
    d = delta[..., None]
    out = a
    units = [-1, 1]
    if diag and 2 * G < a.shape[-1]:
        units += [-2, 2]
    for u in units:
        out = jnp.where(d == u * G, lane_shift(a, u * G, fill), out)
    maxsup = max(units) * G
    if fill is None:
        out = jnp.where(d > maxsup, lane_shift(a, maxsup, None), out)
        out = jnp.where(d < -maxsup, lane_shift(a, -maxsup, None), out)
    else:
        out = jnp.where(jnp.abs(d) > maxsup, jnp.full_like(a, fill), out)
    return out


def align_window(a: jnp.ndarray, delta: jnp.ndarray, center: jnp.ndarray, G: int) -> jnp.ndarray:
    """Window-alignment of a neighbor's banded values into the center
    pixel's band: out[..., k] = a[..., k + delta]; lanes with no source
    (band edge, or |delta| > G i.e. non-overlapping bands) substitute the
    CENTER pixel's own value at that lane. Center-substitution (instead
    of edge replication) is one static iota select in the packed kernels;
    both conventions only differ at band-edge lanes of windows crossing a
    tile boundary."""
    d = delta[..., None]
    B = a.shape[-1]
    up = jnp.concatenate([a[..., G:], center[..., B - G :]], axis=-1)
    dn = jnp.concatenate([center[..., :G], a[..., : B - G]], axis=-1)
    out = jnp.where(d == G, up, jnp.where(d == -G, dn, a))
    return jnp.where(jnp.abs(d) > G, center, out)


def banded_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    s: jnp.ndarray,
    params: StereoSGBMParams,
    band: int,
    G: int,
    stride: int = 1,
) -> jnp.ndarray:
    """(H, W, band) windowed BT cost at absolute disparities
    s(p) + stride*k (stride > 1: disparity-subsampled search — used by
    the coarse pass of hier mode to halve the lane count at full spatial
    resolution; the prior's subpixel parabola interpolates between the
    strided samples).

    The block_size x block_size window sums the per-pixel banded costs of
    the neighbors ALIGNED into p's band (separable: rows then columns,
    center-substitute at band edges — see align_window; image borders
    replicate as in cv2).
    """
    H, W = left.shape
    pix = compute_pixel_cost(left, right, params)  # (H, W, D)
    k = jnp.arange(band) * stride
    pb = jnp.take_along_axis(
        pix, s[..., None] + k[None, None, :], axis=-1
    ).astype(jnp.int32)  # (H, W, B) per-pixel banded cost

    bs = params.block_size
    r = bs // 2

    # Rows pass: out(y) = sum_dy align(P(y+dy), s(y) - s(y+dy)).
    pe = jnp.pad(pb, ((r, r), (0, 0), (0, 0)), mode="edge")
    se = jnp.pad(s, ((r, r), (0, 0)), mode="edge")
    acc = None
    for dy in range(bs):
        delta = s - se[dy : dy + H]
        term = align_window(pe[dy : dy + H], delta, pb, G)
        acc = term if acc is None else acc + term

    # Columns pass.
    pe = jnp.pad(acc, ((0, 0), (r, r), (0, 0)), mode="edge")
    # The row-pass output at column x' is already in s(y, x')'s coords.
    sxe = jnp.pad(s, ((0, 0), (r, r)), mode="edge")
    out = None
    for dx in range(bs):
        delta = s - sxe[:, dx : dx + W]
        term = align_window(pe[:, dx : dx + W], delta, acc, G)
        out = term if out is None else out + term
    return out


def _update_banded(c, L_aligned, P1, P2):
    """SGM update from an ALIGNED predecessor: recompute min, fall back to
    the border rule when the predecessor is fully out of band."""
    minL = jnp.min(L_aligned, axis=-1, keepdims=True)
    full_miss = minL >= _BIGF
    minL_eff = jnp.where(full_miss, 0, minL)
    fill = jnp.full_like(L_aligned[..., :1], _BIGF)
    Lm = jnp.concatenate([fill, L_aligned[..., :-1]], axis=-1)
    Lp = jnp.concatenate([L_aligned[..., 1:], fill], axis=-1)
    cand = jnp.minimum(
        jnp.minimum(L_aligned, minL_eff + P2), jnp.minimum(Lm, Lp) + P1
    )
    return jnp.where(full_miss, c, c + cand - minL_eff)


def _shift_cols(a, direction):
    """Shift along the column axis (axis -2), zero-fill (border rule)."""
    z = jnp.zeros_like(a[..., :1, :])
    if direction > 0:
        return jnp.concatenate([z, a[..., :-1, :]], axis=-2)
    return jnp.concatenate([a[..., 1:, :], z], axis=-2)


def aggregate_banded_scan(
    C: jnp.ndarray,
    s: jnp.ndarray,
    G: int,
    P1: int,
    P2: int,
    num_paths: int = 8,
) -> jnp.ndarray:
    """Banded 8/4-direction aggregation (lax.scan reference).

    C: (H, W, B) int32 banded windowed cost; s: (H, W) int32 shift map
    (same region as C). Mirrors sgbm._aggregate_8's y-flip/x-flip
    batching trick with per-step lane alignment.
    """
    C = C.astype(jnp.int32)
    with_diag = num_paths >= 8
    with_horiz = num_paths >= 3
    H, W, B = C.shape

    # ---- vertical + diagonal set (down for C, up via the y-flip) ----
    C2 = jnp.stack([C, jnp.flip(C, 0)])
    s2 = jnp.stack([s, jnp.flip(s, 0)])

    def row_delta(sp, dx):
        """delta(y, x) = s(y, x) - s(y-1, x-dx); 0 on row 0 (border rule:
        zero carry + zero delta => L = c) and where (y-1, x-dx) is outside
        (the shifted-in zero carry must stay at delta 0)."""
        prev = sp[:, :-1]
        if dx == 1:
            prev = jnp.concatenate([sp[:, 1:, :1], prev[:, :, :-1]], axis=2)
        elif dx == -1:
            prev = jnp.concatenate([prev[:, :, 1:], sp[:, 1:, -1:]], axis=2)
        d = sp[:, 1:] - prev
        return jnp.concatenate([jnp.zeros_like(sp[:, :1]), d], axis=1)

    dv2 = row_delta(s2, 0)
    dd2 = row_delta(s2, 1)
    du2 = row_delta(s2, -1)

    zero = jnp.zeros((2, W, B), jnp.int32)

    def step_v(carry, inp):
        c_row, dv_row, dd_row, du_row = inp
        Lv, Ld, Lu = carry
        # vertical: predecessor (y-1, x)
        Lv2 = _update_banded(
            c_row, align_band(Lv, dv_row, G, fill=_BIGF), P1, P2
        )
        if with_diag:
            Ld2 = _update_banded(
                c_row,
                align_band(_shift_cols(Ld, 1), dd_row, G, diag=True, fill=_BIGF),
                P1, P2,
            )
            Lu2 = _update_banded(
                c_row,
                align_band(_shift_cols(Lu, -1), du_row, G, diag=True, fill=_BIGF),
                P1, P2,
            )
            out = Lv2 + Ld2 + Lu2
        else:
            Ld2, Lu2 = Ld, Lu
            out = Lv2
        return (Lv2, Ld2, Lu2), out

    init = (zero, zero, zero)
    _, Sv = jax.lax.scan(
        step_v,
        init,
        (
            jnp.moveaxis(C2, 1, 0),
            jnp.moveaxis(dv2, 1, 0),
            jnp.moveaxis(dd2, 1, 0),
            jnp.moveaxis(du2, 1, 0),
        ),
    )
    Sv = jnp.moveaxis(Sv, 0, 1)
    S = Sv[0] + jnp.flip(Sv[1], 0)
    if not with_horiz:
        return S

    # ---- horizontal pair (L->R for C, R->L via the x-flip) ----
    C2h = jnp.stack([C, jnp.flip(C, 1)])
    s2h = jnp.stack([s, jnp.flip(s, 1)])
    dh2 = jnp.concatenate(
        [jnp.zeros_like(s2h[:, :, :1]), s2h[:, :, 1:] - s2h[:, :, :-1]], axis=2
    )

    zero_h = jnp.zeros((2, H, B), jnp.int32)

    def step_h(carry, inp):
        c_col, dh_col = inp
        L = carry
        L2 = _update_banded(c_col, align_band(L, dh_col, G, fill=_BIGF), P1, P2)
        return L2, L2

    _, Sh = jax.lax.scan(
        step_h, zero_h, (jnp.moveaxis(C2h, 2, 0), jnp.moveaxis(dh2, 2, 0))
    )
    Sh = jnp.moveaxis(Sh, 0, 2)
    if num_paths == 3:  # vertical pair + L->R only
        return S + Sh[0]
    return S + Sh[0] + jnp.flip(Sh[1], 1)


def banded_stats_scan(
    left: jnp.ndarray,
    right: jnp.ndarray,
    s: jnp.ndarray,
    params: StereoSGBMParams,
    band: int,
    G: int,
    min_x: int,
    stride: int = 1,
    sub: bool = False,
):
    """Banded core (scan backend): cost + aggregation + WTA on columns
    x >= min_x. Returns (minS, best_k, sm, s0, sp, unique_ok) maps of
    shape (H, W - min_x); absolute disparity = stride*best_k + s[:, min_x:].
    With ``sub``, returns (minS, best_k, sub16, unique_ok) instead, with
    the band-relative subpixel parabola (sgbm.subpixel_disp16 in lane
    units) applied — the contract of the Pallas kernels'
    banded_stats_pack(sub=True)."""
    C = banded_cost_volume(left, right, s, params, band, G, stride)[:, min_x:, :]
    sv = s[:, min_x:]
    S = aggregate_banded_scan(C, sv, G, params.P1, params.P2, params.num_paths)
    minS, best, sm, s0, sp, uok = wta_scan(S, band, params.uniqueness_ratio)
    if sub:
        from stereo_vision_tpu.stereo.sgbm import subpixel_disp16

        return minS, best, subpixel_disp16(best, sm, s0, sp, band), uok
    return minS, best, sm, s0, sp, uok
