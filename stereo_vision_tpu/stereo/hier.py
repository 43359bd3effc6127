"""Hierarchical (coarse-to-fine) SGBM: full-range quality at band cost.

Capability extension per /root/repo/BASELINE.json north_star (>= 500
Mpx/s/chip at >= 98% cv2 agreement; the reference jacksonroah/stereo-vision
has no dense stereo at all, SURVEY.md §0). Every dominant cost of exact
SGBM is proportional to the disparity count D (docs/sgbm_roofline.md):
this mode replaces the full-D search with a coarse prior plus a full-
resolution search over a BAND of ``band`` disparities around it.

TPU-first design (absolute-disparity banding; see stereo/banded.py for
why a warped-image formulation was rejected by measurement):

1. Coarse pass: plain SGBM on a ``factor``-downsampled pair with
   D/factor disparities (1/factor^3 of the full-res work).
2. Shift map ``s(y, x)``: the coarse prior is min/max-pooled, the band
   anchored to cover the local range (foreground-first at
   discontinuities), quantized to multiples of ``granularity`` G,
   made piecewise-constant on (f*t x f*t) tiles, and G-Lipschitz-limited
   across tiles by an exact separable MAX-minus (upper-envelope)
   transform — so every per-pixel band operation is a select among a
   small static set of lane shifts, never a gather (the round-1 RULE:
   no gathers when the index set is small + static).
3. Banded core (stereo/banded.py): windowed BT cost, 8/4-direction SGM
   aggregation and WTA over ``band`` lanes, where lane k at pixel p
   means ABSOLUTE disparity s(p) + k and every cross-pixel op aligns
   lanes by the shift delta first. Banding is exact-SGM wherever each
   path predecessor's winner lies inside the band (out-of-band lanes
   contribute minL + P2, the same value cv2 assigns far-away lanes).
4. Absolute disparity = k + s(p), then the FULL-range LR consistency
   check and speckle filter from the exact path.

Semantics vs cv2 full-D SGBM: identical wherever the true winner and
the paths' predecessors lie inside the band. Uniqueness is band-local
(a far-away ambiguity cv2 would see is outside the band). The mode
ships gated on measured agreement (bench.py asserts >= 98% within-1px
on a rendered scene; tests/test_hier.py pins per-scene agreement).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_vision_tpu.stereo.sgbm import (
    StereoSGBMParams,
    lr_fail,
    subpixel_disp16,
)
from stereo_vision_tpu.stereo.postprocess import speckle_filter


class MidLevel(NamedTuple):
    """One intermediate refinement level of the prior pyramid (round 4).

    factor: resolution factor vs FULL res (levels are ordered coarse to
      fine, strictly decreasing, each dividing the previous).
    band/granularity/tile/margin/local_window: the level's banded-search
      and shift-map parameters (tile is in PREVIOUS-level pixels; the
      level's shift-map tile side in its own pixels is
      (prev_factor // factor) * tile and must be 4 px or a multiple
      of 8 for the Pallas reduce kernels).
    paths: SGM path count of the level's aggregation (2 = vertical pair;
      3 measured WORSE than 2 for priors — asymmetric smoothing biases
      band placement, docs/sgbm_roofline.md "Round 4c").
    """

    factor: int
    band: int
    granularity: int
    tile: int = 2
    margin: float = 2.5
    local_window: int = 1
    paths: int = 2


class HierParams(NamedTuple):
    """Coarse-to-fine configuration.

    band: disparity lanes searched at full resolution (multiple of 16).
    granularity: quantum G of the shift map; adjacent tiles differ by at
      most G. band - granularity is the guaranteed usable band around a
      locally-flat prior.
    coarse_factor: downsample factor f of the coarse pass.
    tile: shift-map tile side in COARSE pixels (full-res side = f * tile).
    margin: disparities of slack added beyond the pooled local min/max.
    local_window: min/max pooling radius in coarse pixels around each
      coarse pixel when computing the local disparity range.
    """

    band: int = 32
    granularity: int = 16
    coarse_factor: int = 4
    tile: int = 2
    margin: float = 4.0
    local_window: int = 0
    coarse_uniqueness: int = 10
    coarse_lr: int = 1
    anchor_hi: bool = True
    # Optional X-only coarse downsample factor (None = coarse_factor).
    # fx = 2*fy halves the coarse disparity count Dc = D/fx — at band 16
    # that fits all 8 frames in ONE coarse pack (Dc=16) instead of two.
    # MEASURED REJECTED for HIER_FAST (2026-08-18, CPU scenes): the
    # x-coarsened prior drops ramp/occlusion agreement to 0.976/0.978
    # (< the 0.98/0.983 pins), and larger margins make it WORSE (the
    # widened local range exceeds the 16-lane band, forcing anchor_hi
    # truncation). fy=8/fx=4 fails the same way. Kept as an option.
    coarse_fx: int | None = None
    # Coarse disparity-search stride: lane k means coarse disparity
    # stride*k, searched at FULL coarse spatial resolution (the prior's
    # subpixel parabola interpolates between samples). stride=2 halves
    # the coarse lane count (one 8-frame pack at D=128/f=4 instead of
    # two) without the spatial-coarsening quality loss above.
    coarse_stride: int = 1
    # Cap on the speckle filter's propagation radius (its cost is
    # proportional to this; see postprocess.speckle_filter max_diameter).
    # None = exact cv2 semantics (radius = maxSpeckleSize - 1).
    speckle_diameter: int | None = None
    # SGM path count of the COARSE pass (the prior only needs +-G
    # accuracy; fewer coarse paths save scan kernels at the
    # overhead-bound coarse grid sizes).
    coarse_paths: int = 4
    # ---- optional MID level (round 4): a banded refinement pass at
    # 1/mid_factor resolution between the coarse prior and the full-res
    # band. Purpose: tighten the prior enough that the full-res band can
    # shrink below 16 (band 8 packs 16 frames per 128-lane program; the
    # reduce/pix/box kernels are the band-proportional majority of the
    # pack budget — docs/sgbm_roofline.md "Round 3n" trace). The mid
    # pass runs the SAME banded core at mid resolution with mid_band
    # lanes around the coarse prior; its subpixel disparity map becomes
    # the full-res shift map's prior (scaled by mid_factor).
    mid_factor: int | None = None
    mid_band: int = 16
    mid_granularity: int = 8
    # Tile side in COARSE pixels of the MID shift map (mid tile side in
    # mid px = (coarse_factor // mid_factor) * mid_tile) and of the FULL
    # shift map (full tile side = mid_factor * tile from the base
    # ``tile`` field). Both must land on 4 px or a multiple of 8 px for
    # the Pallas reduce kernels (banded_reduce_pack tile_px).
    mid_tile: int = 2
    mid_margin: float = 4.0
    mid_local_window: int = 1
    mid_paths: int = 4
    # General form of the prior pyramid: an ordered tuple of MidLevel
    # entries (coarse to fine). When set it SUPERSEDES the single-level
    # mid_* fields above (which remain as the one-level shorthand).
    mid_levels: tuple = ()
    # ---- adaptive band placement (round 4, the 2-path rescue): on
    # tiles whose pooled local range EXCEEDS the band (prior
    # discontinuities — exactly where the 2-path mode loses its 0.0003
    # of bigjump agreement), add wide_margin extra disparities of
    # headroom above the anchor_hi placement. Flat tiles keep the tight
    # band; only the discontinuity tiles move.
    wide_margin: float = 0.0


# Measured fast preset (720p/D=128, TPU v5e, chained-jit): band 16 packs
# P = 8 frames per 128-lane program — 8.6 ms/frame = 107 Mpx/s/chip vs
# 12.5 ms = 74 for the band-32 default, interleaved same-session trials.
# G=8 keeps the usable band at 8 disparities; tile=1 (4 px full-res
# tiles) + local_window=1 recover occlusion-edge agreement the narrow
# band otherwise loses (occlusion scene 0.9887 vs 0.9761 at tile=2/lw=0;
# all four adversarial scenes >= 0.983 vs cv2 full-D, tests/test_hier.py).
HIER_FAST = HierParams(
    band=16, granularity=8, margin=4.0, tile=1, local_window=1,
    # Coarse LR OFF (2026-08-18 A/B, chip + CPU adversarial scenes):
    # ~+3 Mpx/s on the headline AND net-better agreement (bench scene
    # 0.9948 -> 0.9954, occlusion 0.9883 -> 0.9899, bigjump 0.9834 ->
    # 0.9846, ramp -0.0006; bigjump EPE 0.229 -> 0.261, bar <= 1 px).
    # The coarse LR invalidates half-occluded pixels which fill_invalid
    # then fills from the BACKGROUND side, fighting anchor_hi's
    # foreground band placement; the un-checked coarse match lands on
    # the foreground, which is what the band wants covered anyway.
    coarse_lr=-1,
    # speckle_diameter 8: the filter's 5R elementwise rounds fall 99->8
    # per phase ratio (2.44 -> ~0.3 ms/frame; it was the largest
    # post-core cost). Agreement moved 0.9947 -> 0.9946 on the bench
    # scene across cap 99 -> 8 (on-chip A/Bs 2026-08-17/18: 109 -> 151
    # Mpx/s at cap 16, -> 176 at cap 8) and holds on all adversarial
    # scenes (tests below) — the cap only keeps thin elongated blobs
    # (diameter > 8 but <= 100 px) that cv2 would remove.
    speckle_diameter=8,
)


# Round-4 band-8 preset: a TWO-LEVEL prior (1/2-res banded mid pass fed
# by the 1/4-res coarse, HierParams.mid_*) tightens the prior enough for
# an 8-lane full-res band — 16 frames per 128-lane program, halving the
# band-proportional kernel cost again (docs/sgbm_roofline.md "Round 4a").
# The single-level band 8 was rejected in r3b at 0.71 agreement; the mid
# level + clamp-artifact splice (_splice_coarse) is what makes it hold
# all four adversarial pins. Mid configuration measured in two rounds of
# A/B (hier_ab_r4d_agreement.py pins + hier_ab_r4e.py chip):
#   mid band 16/4-path  261.2 Mpx/s   (the first passing config)
#   mid band 8/4-path   285.5         (ONE 16-frame mid pack)
#   mid band 8/2-path   292.0         (vertical-pair-only mid reduce;
#       mid_paths=3 FAILS the occl pin — asymmetric L->R-only smoothing
#       is worse for band placement than none)
# Pins (CPU, 3-path full-res, 240x512): ramp 0.9807 / occl 0.9845 /
# reptex 1.0000 / bigjump 0.9800 vs bars 0.98/0.983/0.995/0.978.
# Full tile side = mid_factor*tile = 4 px; mid tile side =
# (coarse_factor/mid_factor)*mid_tile = 4 px.
HIER8_FAST = HIER_FAST._replace(
    band=8, granularity=4, tile=2, margin=1.5,
    mid_factor=2, mid_band=8, mid_granularity=4, mid_tile=2,
    mid_margin=2.5, mid_local_window=1, mid_paths=2,
    # Speckle diameter cap 4 (r4h chip A/B: cap8 291.6 / cap6 297.2 /
    # cap4 302.8 Mpx/s; CPU pins deterministic and all PASS at each cap
    # — cap4 bigjump 0.9792 vs bar 0.978, occl 0.9840 vs 0.983). The
    # cap is one-sided vs cv2 (keeps blobs of diameter > 4 with area
    # <= 100); the bench's in-run 3-scene gate measures the actual 720p
    # divergence vs exact8 and would fall back to hier16x3 below 0.98.
    speckle_diameter=4,
)

# Round-5 band-4 preset: the next rung of the band-halving ladder that
# won rounds 3 and 4 (verdict-r4 #1). 32 frames per 128-lane pack under
# the SAME two-level prior as HIER8_FAST. Tuning history
# (hier_ab_r5a/a2/a3/a4 sweeps + chip traces):
#   - G=1 has the best pins (m0.75/mm3.0: ramp 0.9806 / occl 0.9844 /
#     bigjump 0.9796) but measured 303 vs hier8x3's 307 on chip — the
#     pix kernel's per-column s-select loop runs (D-K)/G + 1 = 125
#     iterations at PACK-constant cost (pix 0.57 -> 0.94 ms/frame).
#   - G=2 halves that loop (63 iters, pix back to parity). The ramp pin
#     needs margin 0.75 AND mid_margin 3.0 (the wider mid band absorbs
#     coarse placement error before it reaches the 4-lane full-res
#     band): ramp 0.9802 / occl 0.9842 / reptex 1.0000 / bigjump 0.9798
#     vs bars 0.98/0.983/0.995/0.978.
# NOTE the 4-stat WTA output is REQUIRED at P=32 (6 stats would need
# 192 lanes); _wta_sub covers every band <= 8.
HIER4_FAST = HIER8_FAST._replace(
    band=4, granularity=2, margin=0.75, mid_margin=3.0,
)

# A DEEP pyramid (coarse 1/8 -> band-16 @ 1/4 -> band-8 @ 1/2 -> band-8
# full; every level bridging only a 2x gap) was the r4 candidate for
# cutting the 0.51 ms/frame coarse cost — MEASURED REJECTED
# (benchmarks/hier_ab_r4g_agreement.py): bigjump pins at 0.968 for
# EVERY L1 configuration (paths/margin/lw invariant — and 4-path L1
# actually improves occl to 0.9915), i.e. the 1/8-res FULL-RANGE search
# itself loses the jump structure and no downstream refinement can
# recover what the coarse never saw. The 1/4-res 4-path coarse is
# load-bearing; the mid_levels machinery stays (exactness-tested) for
# deeper-range configs (e.g. D=256) where the first gap is wider.


def _pool_mat(n: int, nc: int, f: int) -> jnp.ndarray:
    """(n, nc) 0/1 matrix with A[r, c] = (r // f == c)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, nc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, nc), 1)
    return (r // f == c).astype(jnp.float32)


def _downsample_box(img: jnp.ndarray, f: int, fx: int | None = None) -> jnp.ndarray:
    """f x f box-mean downsample, rounded back to integer levels.

    Runs as two 0/1 pooling MATMULS (one per axis) instead of the
    reshape-mean formulation: splitting the lane dimension by f is a
    Mosaic relayout that measured 0.78 ms per 720p frame vs 0.21 for the
    MXU form (benchmarks/resample_ab.py, v5e). Bit-exact for integer
    images <= 255: the first contraction's bf16 operands are exact
    integers with f32 accumulation; the second sees sums <= 255*f (past
    bf16's 8-bit mantissa) and contracts in HIGHEST precision.
    Accepts leading batch axes and an optional distinct x factor ``fx``.
    """
    fy, fx = f, f if fx is None else fx
    H, W = img.shape[-2:]
    Hc, Wc = H // fy, W // fx
    x = img[..., : Hc * fy, : Wc * fx].astype(jnp.float32)
    nd = x.ndim
    t = jax.lax.dot_general(
        x, _pool_mat(Hc * fy, Hc, fy), (((nd - 2,), (0,)), ((), ()))
    )  # (..., W, Hc)
    u = jax.lax.dot_general(
        t, _pool_mat(Wc * fx, Wc, fx), (((nd - 2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (..., Hc, Wc)
    return jnp.round(u / (fy * fx)).astype(jnp.int32)


def _upsample_repeat(
    s: jnp.ndarray, f: int, fx: int | None = None, exact_float: bool = False
) -> jnp.ndarray:
    """jnp.repeat(jnp.repeat(s, f, -2), fx, -1) as two 0/1 expansion
    matmuls (repeat is a lane relayout; measured 0.26 -> 0.21 ms per
    720p map, benchmarks/resample_ab.py). Exact for int values <= 255
    (one exact bf16 product per output). Accepts leading batch axes and
    an optional distinct x factor. ``exact_float``: run the dots at
    HIGHEST precision so arbitrary f32 values replicate exactly (each
    output is value * 1.0 in full f32 — used by the subpixel-float
    splice, whose 1/16 fractions exceed bf16's mantissa)."""
    fy, fx = f, f if fx is None else fx
    Hc, Wc = s.shape[-2:]
    nd = s.ndim
    prec = jax.lax.Precision.HIGHEST if exact_float else None
    t = jax.lax.dot_general(
        s.astype(jnp.float32), _pool_mat(Hc * fy, Hc, fy).T,
        (((nd - 2,), (0,)), ((), ())), precision=prec,
    )  # (..., Wc, H)
    u = jax.lax.dot_general(
        t, _pool_mat(Wc * fx, Wc, fx).T, (((nd - 2,), (0,)), ((), ())),
        precision=prec,
    )  # (..., H, W)
    return u.astype(s.dtype)


# A/B toggle: unroll _fill_invalid's rounds into one XLA fusion instead
# of a fori_loop. Measured a wash on-chip (benchmarks/hier_ab_r3e.py:
# 176.3 vs 176.7 Mpx/s alone, and 179.0 vs 179.6 stacked on the box
# in-kernel deltas) — the coarse fill is not dispatch-overhead bound.
# Kept as a tested option, default off.
_FILL_UNROLL = False


def _fill_invalid(disp: jnp.ndarray, invalid_below: float, rounds: int = 12) -> jnp.ndarray:
    """Fill invalid coarse-prior pixels from the MIN of valid 4-neighbors
    (cv2-style occlusion fill: occluded regions belong to the background,
    i.e. the smaller disparity side). Remaining holes -> 0."""
    H, W = disp.shape
    big = jnp.float32(1e9)

    def nb(a, dy, dx, fill):
        ap = jnp.pad(a, ((1, 1), (1, 1)), constant_values=fill)
        return ap[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]

    def body(_, d):
        valid = d >= invalid_below
        dv = jnp.where(valid, d, big)
        m = jnp.minimum(
            jnp.minimum(nb(dv, 1, 0, big), nb(dv, -1, 0, big)),
            jnp.minimum(nb(dv, 0, 1, big), nb(dv, 0, -1, big)),
        )
        return jnp.where(valid | (m >= big), d, m)

    d = disp.astype(jnp.float32)
    if _FILL_UNROLL:
        for i in range(rounds):
            d = body(i, d)
    else:
        d = jax.lax.fori_loop(0, rounds, body, d)
    return jnp.where(d >= invalid_below, d, 0.0)


def _pool(a: jnp.ndarray, r: int, op) -> jnp.ndarray:
    """(2r+1)^2 min/max pool via static shifts (replicate borders)."""
    H, W = a.shape
    out = a
    ap = jnp.pad(a, ((r, r), (r, r)), mode="edge")
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            out = op(out, ap[r + dy : r + dy + H, r + dx : r + dx + W])
    return out


def shift_map(
    coarse_disp: jnp.ndarray,
    num_disparities: int,
    hp: HierParams,
    coarse_invalid_below: float = 0.0,
) -> jnp.ndarray:
    """Build the full-resolution shift map s from the coarse disparity.

    Returns (Hc*f, Wc*f) int32, values in {0, G, 2G, ..., D - band},
    piecewise-constant on (f*tile x f*tile) tiles, with |s(p) - s(q)| <= G
    for tile-adjacent p, q (city-block Lipschitz).
    """
    D, B, G, f, t = (
        num_disparities, hp.band, hp.granularity, hp.coarse_factor, hp.tile,
    )
    fx = hp.coarse_fx or f
    # Disparity lives on the x axis: the coarse value scales by fx.
    prior = _fill_invalid(coarse_disp, coarse_invalid_below) * fx
    lo = _pool(prior, hp.local_window, jnp.minimum) - hp.margin
    hi = _pool(prior, hp.local_window, jnp.maximum) + hp.margin

    # Per-tile range (tiles of t x t coarse px).
    Hc, Wc = prior.shape
    Ht, Wt = Hc // t, Wc // t
    lo_t = lo[: Ht * t, : Wt * t].reshape(Ht, t, Wt, t).min(axis=(1, 3))
    hi_t = hi[: Ht * t, : Wt * t].reshape(Ht, t, Wt, t).max(axis=(1, 3))

    # Band placement covering the centre of [lo, hi], on the G grid; when
    # the interval [hi - B, lo] of fully-covering offsets is non-empty,
    # clamp the quantized centre into it (guaranteeing full coverage
    # whenever one exists on the grid). When the local range EXCEEDS the
    # band (a disparity discontinuity), anchor to the high side: the
    # low-disparity pixels near such an edge are half-occluded and get
    # LR-invalidated by cv2 anyway, while the foreground must be covered
    # (measured: +1.5% agreement on a 50-px-jump scene).
    s = jnp.round((lo_t + hi_t - B) / 2.0)
    if hp.anchor_hi:
        anchor = hi_t + hp.margin - B
        if hp.wide_margin:
            # Adaptive placement (round 4): tiles whose pooled range
            # exceeds the band are prior discontinuities; give THEM extra
            # foreground headroom while flat tiles keep the tight band.
            wide = (hi_t - lo_t) > float(B)
            anchor = jnp.where(wide, anchor + hp.wide_margin, anchor)
        s = jnp.maximum(s, anchor)
    s = jnp.round(s / G) * G
    lo_ok = jnp.floor(lo_t / G) * G            # largest grid point <= lo
    hi_ok = jnp.ceil((hi_t - B) / G) * G       # smallest grid point >= hi - B
    cover = hi_ok <= lo_ok
    s = jnp.where(cover, jnp.clip(s, hi_ok, lo_ok), s)

    # No Lipschitz smoothing: banded.align_band treats |delta| > G as a
    # non-overlapping predecessor and resets to the border rule, which is
    # the correct restricted-SGM semantics at real discontinuities. Both
    # smoothing variants were measured WORSE (min-plus pulls foreground
    # bands down: -2% on a 50-px-jump scene; max-minus spreads foreground
    # over background: -2.3% on the occlusion scene, -17% textureless).
    s = jnp.clip(s, 0.0, float(D - B)).astype(jnp.int32)

    # Upsample tiles to pixels (MXU expansion; see _upsample_repeat).
    return _upsample_repeat(s, f * t, fx * t)


def _assemble_disparity(
    stats,
    s_v,
    W: int,
    min_x: int,
    ndisp_full: int,
    band: int,
    params: StereoSGBMParams,
    backend: str,
    stride: int = 1,
) -> jnp.ndarray:
    """Banded stats -> full-width float disparity map (pre-speckle).

    stats: (minS, best_k, sm, s0, sp, unique_ok) on columns x >= min_x —
    or the 4-tuple (minS, best_k, sub16, unique_ok) when the subpixel
    parabola was already finished in the WTA kernel (banded_stats_pack /
    banded_stats_scan ``sub=True``; bit-identical values);
    s_v: shift map on the same columns (None => zero, e.g. coarse pass).
    The LR consistency check runs over the FULL ``ndisp_full`` range on
    absolute values. ``stride`` > 1 (strided coarse search): lane k is
    disparity stride*k; the subpixel parabola interpolates in k units
    and is scaled back to disparity units.
    """
    if len(stats) == 4:
        minS, k, sub16, unique_ok = stats
    else:
        minS, k, sm, s0, sp, unique_ok = stats
        sub16 = subpixel_disp16(k, sm, s0, sp, band)
    H = minS.shape[0]
    if s_v is None:
        best_abs = stride * k
        d16 = stride * sub16
    else:
        assert stride == 1, "strided search is coarse-only (s == 0)"
        best_abs = k + s_v
        d16 = sub16 + 16 * s_v
    disp = d16.astype(jnp.float32) / 16.0

    valid = unique_ok
    if params.disp12_max_diff >= 0:
        if (
            len(stats) == 4 and backend == "pallas"
            and min_x == ndisp_full and params.min_disparity == 0
        ):
            # 4-stat + pallas: the packed LR kernel takes (pack, d16)
            # directly and derives floor/ceil in-kernel (d16 >= 0) —
            # one fewer (Wv, H) transposed map shipped and no separate
            # XLA floor/ceil passes (the r4g trace put the LR-adjacent
            # transpose+mul glue at ~1 ms/dispatch). Bit-identical to
            # the lr_fail path (lr_fail_pallas_packed semantics,
            # test_fused_wta_assemble_matches_scan).
            from stereo_vision_tpu.stereo.lr_pallas import lr_fail_pallas_packed

            fail = lr_fail_pallas_packed(
                minS * 2048 + best_abs, d16, W=W, ndisp=ndisp_full,
                mindisp=0, max_diff=params.disp12_max_diff,
            )
            valid = valid & ~fail
        else:
            valid = valid & ~lr_fail(
                minS, best_abs, disp,
                W=W, min_x=min_x, ndisp=ndisp_full, mindisp=0,
                max_diff=params.disp12_max_diff, backend=backend,
            )

    disp = jnp.where(valid, disp, jnp.float32(-1.0))
    full = jnp.full((H, W), -1.0, jnp.float32)
    return jax.lax.dynamic_update_slice(full, disp, (0, min_x))


# A/B toggle: True = assemble the whole pack in one row-stacked call,
# False = per-frame python loop (bit-identical; see _assemble_disparity_pack).
# Measured on the chip (720p full config, interleaved trials): per-frame
# 12.45-12.54 ms/frame vs row-stacked 12.78-13.09 — the P unrolled LR
# select chains are independent and XLA overlaps them, while row-stacking
# fuses them into ONE longer sequential chain. Same lesson as the six
# rejected r2 experiments: never lengthen a dependency chain to save
# dispatches.
_PACK_ASSEMBLE = False

# Same toggle for the COARSE assemble only. Hypothesis was that at
# coarse map sizes ((180, 288) at 720p/f=4) the per-frame chains are
# fixed-pass-overhead bound (the regime where the Pallas coarse LR won),
# so row-stacking pack_c frames into ONE chain should help. MEASURED a
# WASH on the chip (benchmarks/hier_ab_r3f.py, 2026-08-18: 180.4 vs
# 181.2 Mpx/s alloff, and both-on 187.7 vs trim-alone 188.3) — XLA
# already overlaps the independent per-frame coarse chains. Kept as a
# tested option (bit-identical output), default off.
_COARSE_PACK_ASSEMBLE = False

# A/B toggle: fused Pallas box downsample for the coarse image pyramid
# (banded_pallas.downsample_box_pack, bit-identical to _downsample_box).
_DS_PALLAS = True

# A/B toggle: fused WTA output for the full-res stage (band 16 only) —
# the WTA kernel emits (pack, disp16+uok) int32 directly (subpixel
# parabola, absolute-disparity add and LR pack-build all in-kernel; see
# banded_pallas._wta_fused_kernel), and the LR kernel derives floor/
# ceil from disp16. Replaces the 48-of-128-lane 6-stat f32 volume
# (424 MB/720p-pack written + re-read) with a dense 106 MB int32 one
# and removes the XLA subpixel/pack/floor-ceil passes (round 3m).
#
# REJECTED by on-chip A/B (benchmarks/hier_ab_r3m.py, 2026-08-19):
# bit-exact vs the 6-stat assemble but 204 -> 160 Mpx/s — the fused
# kernel adds ~11 MXU matmuls + an 8-step compare-accumulate division
# per 8-row grid step to the ALREADY bandwidth-bound WTA dispatch,
# and the r3b pass-count rule does not apply to the saved XLA glue
# (those passes ran on the small (P, H, Wv) maps, not the volume).
# Kept as a tested capability (test_fused_wta_assemble_matches_scan).
_FUSED_STATS = False

# A/B toggle (round 3n): finish the subpixel parabola INSIDE the WTA
# kernel (banded_stats_pack(sub=True) -> 4 stat maps instead of 6),
# reusing the sel() samples the kernel already computes and shrinking
# the stat unpack by a third. Bit-identical output (the scan reference
# implements the same contract via subpixel_disp16).
#
# Measured on the chip (benchmarks/hier_ab_r3n.py, 2026-08-19): a ~1%
# LOSS (206.2 vs 208.1 Mpx/s) at BAND 16 (P=8, 48-of-128-lane stats) —
# once subpixel_disp16's int32 division was replaced by f32
# compare-accumulates (the real r3n win: that XLA pass went from
# 0.48 ms/pack of int-div lowering to a cheap fused elementwise pass,
# 204 -> 208), the remaining XLA subpixel work on the small (P*H, Wv)
# maps is cheaper than the ~20 extra in-kernel ops. At BAND 8 (P=16)
# the sign FLIPS: the 6-stat output occupies 96 of 128 lanes and its
# unpack slice is 2.1 ms/dispatch (r4g trace) — the 4-stat form cuts a
# third of that, measured +1% (302.2 -> 305.2, /tmp r4i A/B,
# 2026-08-20). Default: ON for 8-lane bands, OFF otherwise; this
# module toggle forces it everywhere (both bit-exact,
# test_sub_stats_vs_scan).
_WTA_SUB = False


def _wta_sub(band: int) -> bool:
    # band 4 REQUIRES the 4-stat form: the 6-stat WTA output packs
    # P*6 lanes, which exceeds 128 at P = 32.
    return _WTA_SUB or band <= 8


def _assemble_fused(pack, du, W, min_x, params, interpret=False):
    """Fused-WTA stats -> (P, H, W) disparities (pre-speckle).

    pack, du: the two (P, H, Wv) int32 maps from banded_stats_pack
    (fused=True). Row-stacks the P frames (every op is row-local) and
    runs ONE lr_fail_pallas_packed dispatch, like the r3k row-stacked
    assemble. Bit-identical to _assemble_disparity_pack on the same
    stats (pinned by tests/test_banded_pallas.py).
    """
    from stereo_vision_tpu.stereo.lr_pallas import lr_fail_pallas_packed

    P, H, Wv = pack.shape
    pflat = pack.reshape(P * H, Wv)
    dflat = du.reshape(P * H, Wv)
    d16 = jnp.bitwise_and(dflat, 32767)
    valid = dflat >= 32768  # the unique_ok bit
    if params.disp12_max_diff >= 0:
        fail = lr_fail_pallas_packed(
            pflat, d16, W=W, ndisp=min_x, mindisp=0,
            max_diff=params.disp12_max_diff, interpret=interpret,
        )
        valid = valid & ~fail
    disp = jnp.where(valid, d16.astype(jnp.float32) / 16.0, jnp.float32(-1.0))
    full = jnp.full((P * H, W), -1.0, jnp.float32)
    full = jax.lax.dynamic_update_slice(full, disp, (0, min_x))
    return full.reshape(P, H, W)


# A/B toggle: row-stack the MID-level assemble (one Pallas LR dispatch
# over the (pack_m*Hm, Wm - Dm) maps per sub-pack) instead of per-frame
# chains — the r3k full-res lesson applied at mid-map sizes.
_MID_ASSEMBLE_ROWSTACK = False

# Round-5: seam-stack the MID level's sub-packs into one kernel chain
# (the _COARSE_SEAM_STACK design applied to a NONZERO shift map —
# pix/box/assemble take the seam-stacked s, the aggregation takes
# s + 2G markers on pad rows). MEASURED REJECTED on the chip
# (2026-08-20, hier4x3 full config: 344.1 vs 346.9 Mpx/s): the mid has
# only TWO sub-packs of dispatch overhead to amortize while every mid
# kernel pays the (top+bot)/Hm = +4.4% pad rows — the coarse win does
# not transfer (its 8 sub-packs ran over 6x smaller maps where fixed
# overhead dominated). Kept as a tested capability (bit-exact,
# test_mid_seam_stack_exact), default off.
_MID_SEAM_STACK = False

# Round-5 coarse seam-stacking (verdict-r4 #2a): run ALL P coarse frames
# in ONE banded_stats_pack call by stacking the P // pack_c sub-packs
# ROW-wise (each stacked "frame" holds nseg image segments separated by
# pad rows), instead of a python loop of nseg dispatch chains. The r5
# stage split (benchmarks/hier_split_r5.py) put the coarse stage at
# 0.50 ms/frame — 18% of the hier4x3 budget — dominated by per-sub-pack
# dispatch + XLA assemble overhead at the tiny coarse map sizes (the
# r3d finding: coarse chains are fixed-pass-overhead bound).
#
# Seam semantics (bit-exact vs the per-sub-pack loop on real rows,
# tests/test_banded_pallas.py::TestCoarseSeamStack):
#   - segment layout [top=8 replicate rows | Hc real | bot=4|8 replicate
#     rows], Hseg % 8 == 0, so every segment's first real row lands on a
#     block-entry (top=8) realign row and the y-FLIPPED scan's first
#     real row lands on a mid-block (bot=4, needs tile_px=4) or
#     block-entry (bot=8) realign row;
#   - pad rows carry shift value 2G (real rows 0): the realign delta at
#     each seam is -+2G, beyond align_band's supported +-G, which the
#     kernels define as a full reset to the SGM border rule L = c —
#     exactly the per-frame top/bottom border behavior;
#   - the aligned box window center-substitutes across the +-2G seam
#     (|delta| > G), which equals the per-frame replicate-border rule;
#     sobel reads the +-1 replicate pad rows directly;
#   - every other op (horizontal scans, WTA, uniqueness, LR, assemble)
#     is row-local, so pad-row garbage never reaches a real row.
_COARSE_SEAM_STACK = True


def _seam_geometry(Hc: int) -> tuple[int, int, int] | None:
    """(top, bot, Hseg) for the seam-stacked layout, or None when the
    geometry is unsupported (Hc % 4 != 0: no realign row can coincide
    with the flipped scan's real-entry row)."""
    if Hc % 4 != 0:
        return None
    top = 8
    bot = 4 if (top + Hc) % 8 == 4 else 8
    if (top + Hc + bot) % 8 != 0:
        return None
    return top, bot, top + Hc + bot


def _seam_stack(img: jnp.ndarray, pack_c: int, top: int, bot: int) -> jnp.ndarray:
    """(P, Hc, Wc) -> (pack_c, nseg*Hseg, Wc): frame g*pack_c + j becomes
    segment g of stacked frame j, with replicate pad rows."""
    P, Hc, Wc = img.shape
    nseg = P // pack_c
    x = img.reshape(nseg, pack_c, Hc, Wc)
    x = jnp.concatenate(
        [
            jnp.broadcast_to(x[:, :, :1], (nseg, pack_c, top, Wc)),
            x,
            jnp.broadcast_to(x[:, :, -1:], (nseg, pack_c, bot, Wc)),
        ],
        axis=2,
    )
    Hseg = top + Hc + bot
    return jnp.moveaxis(x, 0, 1).reshape(pack_c, nseg * Hseg, Wc)


def _seam_unstack(
    stk: jnp.ndarray, P: int, Hc: int, top: int, bot: int
) -> jnp.ndarray:
    """Inverse of _seam_stack on the real rows: -> (P, Hc, Wc)."""
    pack_c, Hs, Wc = stk.shape
    Hseg = top + Hc + bot
    nseg = Hs // Hseg
    x = stk.reshape(pack_c, nseg, Hseg, Wc)[:, :, top : top + Hc]
    return jnp.moveaxis(x, 0, 1).reshape(P, Hc, Wc)


# LR backend for the COARSE assemble in stereo_sgbm_hier_batch ("auto"
# resolves to the fused Pallas kernel on TPU). A/B on the chip
# (benchmarks/hier_ab_r3d.py + _r3d2.py, 2026-08-18): the coarse scan-LR
# chains run 34 unfused XLA passes per sub-pack over tiny (180, 320)
# maps where fixed pass overhead dominates — the Pallas kernel measured
# +3.4 Mpx/s on the hier16 headline at bit-identical output
# (tests/test_lr_pallas.py pins kernel-vs-chains equality). At the
# FULL-RES assemble the same swap is a WASH (scan chains fuse well at
# 720p map sizes; both directions within the ±3 run noise), so full-res
# keeps the scan chains.
_COARSE_LR_BACKEND = "auto"


def _assemble_disparity_pack(
    stats, s_v, W, min_x, ndisp_full, band, params, backend, stride=1,
    row_stack=None,
):
    """Assemble the packed stats into (P, H, W) disparities.

    Row-stacked form (``row_stack``, default ``_PACK_ASSEMBLE``): every
    op in :func:`_assemble_disparity` (subpixel parabola, LR check via
    static row shifts, the column update-slice) is row-local, so the P
    frames can be concatenated along rows and assembled in ONE call with
    bit-identical per-frame output — but it measured ~3% slower at FULL
    resolution (see toggle note), while the coarse assemble passes
    row_stack=True (``_COARSE_PACK_ASSEMBLE``). (The vmap formulation is
    NOT equivalent in cost either way: XLA lays vmapped LR intermediates
    out batch-minormost, a 32x lane-padding blowup.)
    """
    if row_stack is None:
        row_stack = _PACK_ASSEMBLE
    P, H = stats[0].shape[0], stats[0].shape[1]
    if not row_stack:
        return jnp.stack([
            _assemble_disparity(
                [st[b] for st in stats],
                None if s_v is None else s_v[b],
                W, min_x, ndisp_full, band, params, backend, stride,
            )
            for b in range(P)
        ])
    flat = [st.reshape(P * H, st.shape[-1]) for st in stats]
    sv = None if s_v is None else s_v.reshape(P * H, s_v.shape[-1])
    out = _assemble_disparity(flat, sv, W, min_x, ndisp_full, band, params, backend, stride)
    return out.reshape(P, H, W)


def _coarse_params(params: StereoSGBMParams, D: int, fx: int, hp: HierParams) -> StereoSGBMParams:
    return params._replace(
        num_disparities=D // fx,
        uniqueness_ratio=hp.coarse_uniqueness,
        disp12_max_diff=hp.coarse_lr,
        speckle_window_size=0,
        num_paths=hp.coarse_paths,
    )


def _splice_coarse(
    disp_m: jnp.ndarray,
    best_k: jnp.ndarray,
    disp_c: jnp.ndarray,
    s_m: jnp.ndarray,
    Bm: int,
    Dm: int,
    fc: int,
) -> jnp.ndarray:
    """Mid disparity with band-clamp artifacts replaced by the coarse value.

    The mid search was confined to [s_m, s_m + Bm - 1]. Where the
    FULL-range coarse value lies OUTSIDE that band — prior
    discontinuities, where anchor_hi pins background pixels onto
    foreground bands — the mid output never even considered the
    coarse-preferred disparity and is a clamp artifact: SGM's P2
    smoothing often parks such a winner mid-band at the FOREGROUND
    value, not at the band edge, so a band-edge test alone misses it
    (measured: occl coverage 0.954 -> see hier_ab_r4a_agreement.py; the
    artifacts poison the next level's pooled band placement). As a final
    output these pixels are LR-invalidated anyway; as a PRIOR the coarse
    value is the honest fallback. Band-BOUNDARY winners (k <= 1 /
    k >= Bm - 2, where the subpixel parabola cannot run) are spliced
    too; -1 (invalid) falls through to shift_map's _fill_invalid.

    disp_m: (Hm, Wm) assembled mid disparity; best_k: (Hm, Wm - Dm) WTA
    lane; disp_c: coarse disparity (values in coarse units, 1/fc of
    mid); s_m: the mid shift map; fc: coarse-to-mid resolution factor.
    """
    Hm, Wm = disp_m.shape
    edge = (best_k <= 1) | (best_k >= Bm - 2)
    edge_full = jax.lax.dynamic_update_slice(
        jnp.zeros((Hm, Wm), bool), edge, (0, Dm)
    )
    # MXU expansion, not jnp.repeat (repeat on the lane dim is a Mosaic
    # relayout — the r3b resampling lesson); exact_float because the
    # coarse disparity carries 1/16 subpixel fractions past bf16.
    # Chip A/B 2026-08-21: a WASH at mid-map sizes (384.0 both ways) —
    # kept for the rule's sake (bit-exact either way).
    cu = _upsample_repeat(disp_c, fc, exact_float=True)
    cu = jnp.pad(
        cu, ((0, Hm - cu.shape[0]), (0, Wm - cu.shape[1])), mode="edge"
    )[:Hm, :Wm]
    cu = jnp.where(cu >= 0, cu * fc, -1.0)
    covered = (cu < 0) | ((cu >= s_m) & (cu <= s_m + (Bm - 1)))
    good_mid = (disp_m >= 0) & ~edge_full & covered
    return jnp.where(good_mid, disp_m, cu)


def _prior_levels(hp: HierParams) -> tuple[MidLevel, ...]:
    """The ordered (coarse-to-fine) intermediate levels of the prior
    pyramid: ``mid_levels`` when set, else the single-level ``mid_*``
    shorthand, else none."""
    if hp.mid_levels:
        return tuple(hp.mid_levels)
    if hp.mid_factor is not None:
        return (MidLevel(
            hp.mid_factor, hp.mid_band, hp.mid_granularity, hp.mid_tile,
            hp.mid_margin, hp.mid_local_window, hp.mid_paths,
        ),)
    return ()


def _level_shift_params(hp: HierParams, lv: MidLevel, prev_f: int) -> HierParams:
    """shift_map parameters for pyramid level ``lv``: its prior comes
    from the previous level at ``prev_f // lv.factor`` times its own
    resolution."""
    assert hp.coarse_fx is None, "prior pyramid assumes square coarse factors"
    assert prev_f % lv.factor == 0 and prev_f > lv.factor, (prev_f, lv.factor)
    return HierParams(
        band=lv.band, granularity=lv.granularity,
        coarse_factor=prev_f // lv.factor,
        tile=lv.tile, margin=lv.margin,
        local_window=lv.local_window, anchor_hi=hp.anchor_hi,
        wide_margin=hp.wide_margin,
    )


def stereo_sgbm_hier(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams = StereoSGBMParams(),
    hp: HierParams = HierParams(),
) -> jnp.ndarray:
    """Hierarchical SGBM disparity (see module docstring).

    Drop-in for :func:`stereo_sgbm` (same output convention: (H, W)
    float32, invalid = -1, valid region x >= num_disparities) at a
    fraction of the compute; agreement vs cv2 full-D is measured, not
    bit-exact (tests/test_hier.py, bench.py gate).

    Single-frame entry (lax.scan banded core). For TPU throughput use
    :func:`stereo_sgbm_hier_batch`, whose lane-packed Pallas kernels
    process 128//band frames at full vector utilization.
    """
    assert params.min_disparity == 0, "hier mode assumes min_disparity == 0"
    D = params.num_disparities
    B, G, f = hp.band, hp.granularity, hp.coarse_factor
    fx = hp.coarse_fx or f
    # B % 4: band 4 (32 frames/pack) is measurable through the scan core;
    # the packed kernels themselves gate on their own lane asserts.
    assert D % (fx * 16) == 0 and B % 4 == 0 and (D - B) % G == 0
    H, W = left.shape

    # 1. Coarse prior.
    cp = _coarse_params(params, D, fx, hp)
    lc, rc = _downsample_box(left, f, fx), _downsample_box(right, f, fx)
    if hp.coarse_stride == 1:
        from stereo_vision_tpu.stereo.sgbm import stereo_sgbm

        disp_c = stereo_sgbm(lc, rc, cp)
    else:
        # Strided coarse search via the banded scan core (s = 0).
        from stereo_vision_tpu.stereo.banded import banded_stats_scan

        Dc = D // fx
        Kc = Dc // hp.coarse_stride
        s0c = jnp.zeros(lc.shape, jnp.int32)
        stats_c = banded_stats_scan(
            lc, rc, s0c, cp, Kc, G, min_x=Dc, stride=hp.coarse_stride
        )
        disp_c = _assemble_disparity(
            stats_c, None, lc.shape[1], Dc, Dc, Kc, cp, "scan",
            stride=hp.coarse_stride,
        )

    # 1b. Optional MID levels (prior pyramid): banded refinements of the
    # coarse prior at decreasing factors (same core, each level's
    # subpixel disparity spliced with its predecessor becomes the next
    # prior) — tight enough for full-res bands < 16.
    prior, prev_f, prior_hp = disp_c, f, hp
    levels = _prior_levels(hp)
    if levels:
        from stereo_vision_tpu.stereo.banded import banded_stats_scan

        for lv in levels:
            m = lv.factor
            assert D % m == 0 and lv.band % 8 == 0
            Dm, Bm, Gm = D // m, lv.band, lv.granularity
            lm, rm = _downsample_box(left, m), _downsample_box(right, m)
            s_m = shift_map(prior, Dm, _level_shift_params(hp, lv, prev_f))
            Hm, Wm = lm.shape
            if s_m.shape != (Hm, Wm):
                s_m = jnp.pad(
                    s_m, ((0, Hm - s_m.shape[0]), (0, Wm - s_m.shape[1])),
                    mode="edge",
                )
            pm = _coarse_params(params, D, m, hp)._replace(num_paths=lv.paths)
            stats_m = banded_stats_scan(lm, rm, s_m, pm, Bm, Gm, min_x=Dm)
            disp_m = _assemble_disparity(
                stats_m, s_m[:, Dm:], Wm, Dm, Dm, Bm, pm, "scan"
            )
            prior = _splice_coarse(
                disp_m, stats_m[1], prior, s_m, Bm, Dm, prev_f // m
            )
            prev_f = m
        prior_hp = hp._replace(coarse_factor=prev_f, coarse_fx=None)

    # 2. Shift map.
    s = shift_map(prior, D, prior_hp)
    sH, sW = s.shape
    if (sH, sW) != (H, W):  # H or W not divisible by f*tile: edge-extend
        s = jnp.pad(s, ((0, H - sH), (0, W - sW)), mode="edge")

    # 3. Banded core (absolute-disparity lanes, aligned window/carries) at
    # the full range's valid region (x >= D, like cv2 full-D).
    backend = params.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "scan"
    from stereo_vision_tpu.stereo.banded import banded_stats_scan

    stats = banded_stats_scan(left, right, s, params, B, G, min_x=D)

    # 4. Absolute disparity + full-range postprocessing.
    full = _assemble_disparity(stats, s[:, D:], W, D, D, B, params, backend)

    if params.speckle_window_size > 0:
        full = speckle_filter(
            full,
            max_diff=float(params.speckle_range),
            max_speckle_size=params.speckle_window_size,
            invalid_value=-1.0,
            max_diameter=hp.speckle_diameter,
        )
    return full


def hier_batch_prior(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams,
    hp: HierParams,
    interpret: bool = False,
):
    """Stages 1/1b of :func:`stereo_sgbm_hier_batch`: the coarse pass
    (and the optional mid level) through the packed kernels.

    Returns (disp_c, prior, prior_hp): the coarse disparity pack, the
    full-res prior pack (== disp_c without a mid level), and the
    HierParams whose coarse_factor/tile describe the prior's geometry.
    Exposed separately so stage-split benchmarks can time the prior
    stack against the full pipeline (benchmarks/hier_split_r4.py).
    """
    D = params.num_disparities
    B, G, f = hp.band, hp.granularity, hp.coarse_factor
    fx = hp.coarse_fx or f
    P, H, W = left.shape
    assert P * B == 128, f"pack count {P} x band {B} must fill 128 lanes"
    Dc = D // fx
    Kc = Dc // hp.coarse_stride  # coarse LANES (disparity = stride * k)
    assert Dc % hp.coarse_stride == 0 and 128 % Kc == 0
    pack_c = 128 // Kc  # frames per COARSE pack (may differ from P:
    #                     band 16 packs 8 frames full-res but Dc=32
    #                     coarse lanes fit only 4 — run 2 coarse calls,
    #                     or ONE with coarse_stride=2: Kc=16)
    assert P % pack_c == 0, f"pack {P} not a multiple of coarse pack {pack_c}"

    from stereo_vision_tpu.stereo.banded_pallas import (
        banded_stats_pack,
        downsample_box_pack,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    clr_backend = _COARSE_LR_BACKEND
    if clr_backend == "auto":
        clr_backend = "pallas" if on_tpu and not interpret else "scan"

    # 1. Coarse prior via the SAME packed kernels (band = Kc, s = 0).
    # Downsample backend: the fused Pallas kernel when its shape
    # constraints hold (bit-identical to _downsample_box, which spends
    # ~20 unfused XLA passes per image — benchmarks/coarse_split_bench).
    cp = _coarse_params(params, D, fx, hp)
    if _DS_PALLAS and (on_tpu or interpret) and fx == f and 8 % f == 0 and H % 8 == 0:
        lc = downsample_box_pack(left, f, interpret=interpret)
        rc = downsample_box_pack(right, f, interpret=interpret)
    else:
        lc = _downsample_box(left, f, fx)
        rc = _downsample_box(right, f, fx)
    Hc, Wc = lc.shape[1:]
    seam = _seam_geometry(Hc) if (
        _COARSE_SEAM_STACK and P > pack_c and hp.coarse_stride == 1
    ) else None
    if seam is not None:
        # ONE seam-stacked call for all P frames (see _COARSE_SEAM_STACK).
        top, bot, Hseg = seam
        nseg = P // pack_c
        lcs = _seam_stack(lc, pack_c, top, bot)
        rcs = _seam_stack(rc, pack_c, top, bot)
        # Marker map for the AGGREGATION only: pad rows get 2G so the
        # seam realign delta (-+2G, beyond the supported +-G) resets the
        # scans to the border rule at each segment's first real row.
        # pix/box keep the true all-zeros map (s_reduce split): the
        # replicate pad rows then contribute EXACTLY the per-frame
        # replicate-border window terms (a marker-valued s would
        # center-substitute them instead, which diverges at rows
        # 0..1 / Hc-2..Hc-1 — measured in the r5 seam-stack debug).
        row = jnp.arange(nseg * Hseg) % Hseg
        pad_row = (row < top) | (row >= top + Hc)
        s_mark = jnp.broadcast_to(
            jnp.where(pad_row[None, :, None], 2 * G, 0).astype(jnp.int32),
            (pack_c, nseg * Hseg, Wc),
        )
        s0_stk = jnp.zeros((pack_c, nseg * Hseg, Wc), jnp.int32)
        stats = banded_stats_pack(
            lcs, rcs, s0_stk, cp, Kc, G, min_x=Dc, stride=1, sub=True,
            tile_px=4 if bot == 4 else 8, s_reduce=s_mark,
            seam=(top, Hc, Hseg), interpret=interpret,
        )
        disp_stk = _assemble_disparity_pack(
            # s_v=None: real rows have s == 0, and pad-row garbage never
            # reaches a real row (every assemble op is row-local).
            list(stats), None, Wc, Dc, Dc, Kc, cp, clr_backend,
            stride=1, row_stack=(clr_backend == "pallas"),
        )
        disp_c = _seam_unstack(disp_stk, P, Hc, top, bot)
    else:
        s0 = jnp.zeros((pack_c, Hc, Wc), jnp.int32)
        disp_c = jnp.concatenate([
            _assemble_disparity_pack(
                list(banded_stats_pack(
                    lc[i : i + pack_c], rc[i : i + pack_c], s0, cp, Kc, G,
                    # Coarse stats always take the 4-stat in-kernel-subpixel
                    # form: the coarse maps are unpack-overhead-bound,
                    # measured +1.1 Mpx/s on the hier8 headline (/tmp r4i2
                    # A/B; r3n's -1% was the full-res band-16 stage).
                    min_x=Dc, stride=hp.coarse_stride, sub=True,
                    interpret=interpret,
                )),
                None, Wc, Dc, Dc, Kc, cp, clr_backend,
                stride=hp.coarse_stride, row_stack=_COARSE_PACK_ASSEMBLE,
            )
            for i in range(0, P, pack_c)
        ])

    # 1b. Optional MID levels (prior pyramid) through the SAME packed
    # kernels (see stereo_sgbm_hier): each level refines the previous
    # prior with its own band at 1/factor res; the spliced disparity
    # becomes the next prior.
    prior, prev_f, prior_hp = disp_c, f, hp
    levels = _prior_levels(hp)
    for lv in levels:
        m = lv.factor
        assert D % m == 0
        Dm, Bm, Gm = D // m, lv.band, lv.granularity
        pack_m = 128 // Bm
        assert P % pack_m == 0, f"pack {P} not a multiple of level pack {pack_m}"
        if _DS_PALLAS and (on_tpu or interpret) and 8 % m == 0 and H % 8 == 0:
            lm = downsample_box_pack(left, m, interpret=interpret)
            rm = downsample_box_pack(right, m, interpret=interpret)
        else:
            lm = _downsample_box(left, m)
            rm = _downsample_box(right, m)
        Hm, Wm = lm.shape[1:]
        hpm = _level_shift_params(hp, lv, prev_f)
        s_m = jax.vmap(lambda d: shift_map(d, Dm, hpm))(prior)
        if s_m.shape[1:] != (Hm, Wm):
            s_m = jnp.pad(
                s_m,
                ((0, 0), (0, Hm - s_m.shape[1]), (0, Wm - s_m.shape[2])),
                mode="edge",
            )
        pm = _coarse_params(params, D, m, hp)._replace(num_paths=lv.paths)
        t_lv = (prev_f // m) * lv.tile  # level shift-map tile side, level px
        assert t_lv % 8 == 0 or t_lv == 4, f"unsupported level tile {t_lv}px"
        fc = prev_f // m
        seam_m = _seam_geometry(Hm) if (
            _MID_SEAM_STACK and P > pack_m and t_lv == 4
        ) else None
        if seam_m is not None:
            # Seam-stacked mid (same machinery as the coarse, with a
            # NONZERO map): pix/box/assemble use the seam-stacked s
            # (pad rows replicate the edge row — together with the box
            # kernel's segment-local clamping this reproduces the
            # per-frame replicate border exactly); the aggregation's
            # s_reduce adds 2G on pad rows, making each seam delta
            # -+2G = the border-rule reset. top=8 keeps the stacked
            # rows congruent to the per-frame rows mod 8, so the
            # tile-grid phase the realign logic assumes is preserved.
            top_m, bot_m, Hseg_m = seam_m
            nseg_m = P // pack_m
            lms = _seam_stack(lm, pack_m, top_m, bot_m)
            rms = _seam_stack(rm, pack_m, top_m, bot_m)
            sms = _seam_stack(s_m, pack_m, top_m, bot_m)
            rowm = jnp.arange(nseg_m * Hseg_m) % Hseg_m
            padm = (rowm < top_m) | (rowm >= top_m + Hm)
            s_red = jnp.where(padm[None, :, None], sms + 2 * Gm, sms)
            stats_s = list(banded_stats_pack(
                lms, rms, sms, pm, Bm, Gm, min_x=Dm, tile_px=4,
                sub=_wta_sub(Bm), s_reduce=s_red,
                seam=(top_m, Hm, Hseg_m), interpret=interpret,
            ))
            disp_s = _assemble_disparity_pack(
                stats_s, sms[:, :, Dm:], Wm, Dm, Dm, Bm, pm,
                clr_backend, row_stack=(clr_backend == "pallas"),
            )
            disp_u = _seam_unstack(disp_s, P, Hm, top_m, bot_m)
            k_u = _seam_unstack(stats_s[1], P, Hm, top_m, bot_m)
            prior = jax.vmap(
                lambda dm, k, dc, sm: _splice_coarse(dm, k, dc, sm, Bm, Dm, fc)
            )(disp_u, k_u, prior, s_m)
        else:
            parts = []
            for i in range(0, P, pack_m):
                stats_i = list(banded_stats_pack(
                    lm[i : i + pack_m], rm[i : i + pack_m], s_m[i : i + pack_m],
                    pm, Bm, Gm, min_x=Dm, tile_px=4 if t_lv == 4 else 8,
                    sub=_wta_sub(Bm), interpret=interpret,
                ))
                disp_i = _assemble_disparity_pack(
                    stats_i, s_m[i : i + pack_m, :, Dm:], Wm, Dm, Dm, Bm, pm,
                    clr_backend, row_stack=_MID_ASSEMBLE_ROWSTACK,
                )
                parts.append(jax.vmap(
                    lambda dm, k, dc, sm: _splice_coarse(dm, k, dc, sm, Bm, Dm, fc)
                )(disp_i, stats_i[1], prior[i : i + pack_m], s_m[i : i + pack_m]))
            prior = jnp.concatenate(parts)
        prev_f = m
    if levels:
        prior_hp = hp._replace(coarse_factor=prev_f, coarse_fx=None)
    return disp_c, prior, prior_hp


def stereo_sgbm_hier_batch(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams = StereoSGBMParams(),
    hp: HierParams = HierParams(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched hierarchical SGBM through the lane-packed Pallas kernels.

    Args:
      left, right: (P, H, W) with P = 128 // band frames — the pack
        count that fills the 128-lane registers (4 at band=32).

    Returns (P, H, W) float32 disparities (same convention as
    :func:`stereo_sgbm_hier`; per-frame results are bit-identical to it
    when both use the same coarse backend — tests/test_banded_pallas.py).
    """
    assert params.min_disparity == 0
    D = params.num_disparities
    B, G, f = hp.band, hp.granularity, hp.coarse_factor
    fx = hp.coarse_fx or f
    P, H, W = left.shape
    on_tpu = jax.default_backend() not in ("cpu", "gpu")

    from stereo_vision_tpu.stereo.banded_pallas import banded_stats_pack

    _, prior, prior_hp = hier_batch_prior(left, right, params, hp, interpret)

    # 2. Shift maps.
    s = jax.vmap(lambda d: shift_map(d, D, prior_hp))(prior)
    if s.shape[1:] != (H, W):
        s = jnp.pad(
            s, ((0, 0), (0, H - s.shape[1]), (0, W - s.shape[2])), mode="edge"
        )

    # 3. Banded packed core on the full-range valid region. The shift
    # map is piecewise-constant on (f*tile)-row x (fx*tile)-col pixel
    # tiles; the reduce kernels need the tile side to place their carry
    # re-alignments (4 adds a mid-block realignment; multiples of 8 are
    # entry-only). With an asymmetric coarse_fx the two sides differ:
    # take the MIN — a mid-block realign on an 8-aligned axis sees a
    # zero delta and is an exact no-op (TestTile4Realign asymmetric
    # case), while SKIPPING one on a 4-px axis would run unaligned.
    levels = _prior_levels(hp)
    pf = levels[-1].factor if levels else f
    pfx = levels[-1].factor if levels else fx
    ty, tx = pf * hp.tile, pfx * hp.tile
    for t_px in (ty, tx):
        assert t_px % 8 == 0 or t_px == 4, \
            f"unsupported shift tile {t_px}px (need 4 or a multiple of 8)"
    tile_px = 4 if min(ty, tx) == 4 else 8

    backend = params.backend
    if backend == "auto":
        # Full-res assemble: on TPU, row-stack the P frames and run the
        # Pallas LR kernel ONCE over the (P*H, Wv) maps (each lane is an
        # independent row, so frame mixing inside a 128-row block is
        # exact). Chip A/B hier_ab_r3k (2026-08-18, hier16x3): scan
        # per-frame 200.3 / pallas per-frame 201.3 (wash, as r3d found) /
        # scan row-stacked 141.7 (the r3b chain-lengthening loss) /
        # pallas row-stacked 209.6-211.4 — the ONLY winning combination:
        # row-stacking is what amortizes the kernel dispatch, and the
        # kernel is what keeps the select work off the XLA chain.
        backend = "pallas" if on_tpu and not interpret else "scan"

    fused = (
        _FUSED_STATS and backend == "pallas" and B == 16 and P == 8
        and params.min_disparity == 0
    )
    if fused:
        # Round-3m fused path: WTA emits (pack, disp16+uok) int32
        # directly; subpixel/pack-build/floor-ceil never touch XLA.
        pack, du = banded_stats_pack(
            left, right, s, params, B, G, min_x=D, tile_px=tile_px,
            fused=True, interpret=interpret,
        )
        frames = _assemble_fused(pack, du, W, D, params, interpret=interpret)
    else:
        stats = banded_stats_pack(
            left, right, s, params, B, G, min_x=D, tile_px=tile_px,
            sub=_wta_sub(B), interpret=interpret,
        )
        frames = _assemble_disparity_pack(
            list(stats), s[:, :, D:], W, D, D, B, params, backend,
            row_stack=(backend == "pallas"),
        )
    if params.speckle_window_size > 0:
        # Speckle stays per-frame, NOT batched: speckle_filter accepts
        # (P, H, W) but the batched form measured 12% SLOWER on the chip
        # (23.26 vs 20.81 ms per 4-frame dispatch — the while-loop carry
        # quadruples and the rounds are bandwidth-bound, so there is no
        # per-round overhead left to amortize).
        frames = jnp.stack([
            speckle_filter(
                frames[b],
                max_diff=float(params.speckle_range),
                max_speckle_size=params.speckle_window_size,
                invalid_value=-1.0,
                max_diameter=hp.speckle_diameter,
            )
            for b in range(P)
        ])
    return frames


stereo_sgbm_hier_jit = jax.jit(stereo_sgbm_hier, static_argnames=("params", "hp"))
