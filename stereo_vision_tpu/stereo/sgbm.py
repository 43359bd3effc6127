"""Semi-global block matching (cv2.StereoSGBM MODE_HH parity) in pure JAX.

Capability extension per /root/repo/BASELINE.json config #2 (1280x720,
D=128, 8-path, subpixel + LR-check + speckle). The reference has no dense
stereo (SURVEY.md §0); parity is measured against cv2.StereoSGBM.

TPU-first structure (SURVEY.md §5 "long-context" note): the 8 directional
aggregations are the sequential dimension. They compile to two
``lax.scan``s — one over rows carrying the three "downward" directions
(vertical + both diagonals, with the diagonal carries shifted one column
per step), run twice via a y-flip for the upward set; one over columns for
the horizontal pair via an x-flip. All per-step work is batched (W, D) /
(H, D) vector math on the VPU; nothing is per-pixel.

Matching cv2 semantics:
  - Birchfield-Tomasi pixel cost on two channels: clipped x-Sobel (full
    weight) + raw intensity (>>2), summed over a blockSize window with
    replicate-clamped borders.
  - Aggregation L_r(p,d) = C + min(L', L'(d±1)+P1, minL'+P2) - minL',
    zero boundary (border L = C).
  - WTA over the 8-direction sum, uniqueness ratio, subpixel parabola with
    cv2's integer rounding semantics, optional LR check (floor & ceil rule)
    and speckle filter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_vision_tpu.stereo.postprocess import speckle_filter

_BIG = jnp.int32(1 << 29)

# LR backend for the EXACT full-D path: the fused Pallas kernel
# (stereo/lr_pallas.py) is bit-identical but measured NO faster than the
# XLA static-shift chains there (25.9 vs 25.5 ms full-frame A/B on v5e)
# — XLA fuses the select chains better than the device trace suggested.
# Kept off for stereo_sgbm; flip for A/B timing. The hier batch path
# requests the Pallas kernel EXPLICITLY via lr_fail(backend="pallas")
# (an explicit request is honored regardless of this flag — r3b shipped
# backend resolution that this flag silently overrode back to scan,
# losing the measured hier win).
_LR_PALLAS = False


class StereoSGBMParams(NamedTuple):
    min_disparity: int = 0
    num_disparities: int = 128
    block_size: int = 5
    p1: int | None = None          # default 8 * block_size**2
    p2: int | None = None          # default 32 * block_size**2
    disp12_max_diff: int = -1      # <0 disables the LR check
    prefilter_cap: int = 15        # cv2: ftzero = max(preFilterCap, 15) | 1
    uniqueness_ratio: int = 0
    speckle_window_size: int = 0   # 0 disables
    speckle_range: int = 0
    backend: str = "auto"          # "auto" | "scan" | "pallas"
    num_paths: int = 8             # 8 = cv2 MODE_HH parity; 4 = fast mode
                                   # (vertical+horizontal only, no cv2 parity)

    @property
    def P1(self) -> int:
        # `is not None`: an explicit 0 must stay 0 (pure WTA), not fall
        # back to the default — cv2 honors P1=0.
        return self.p1 if self.p1 is not None else 8 * self.block_size * self.block_size

    @property
    def P2(self) -> int:
        return self.p2 if self.p2 is not None else 32 * self.block_size * self.block_size

    @property
    def ftzero(self) -> int:
        return max(self.prefilter_cap, 15) | 1


def _xsobel_clipped(img: jnp.ndarray, ftzero: int) -> jnp.ndarray:
    """SGBM's row Sobel: clip(dx, -ftzero, ftzero) + ftzero; borders = ftzero."""
    img = img.astype(jnp.int32)
    up = jnp.concatenate([img[:1], img[:-1]], axis=0)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)

    def dx(a):
        l = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        r = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        return r - l

    d = 2 * dx(img) + dx(up) + dx(down)
    v = jnp.clip(d, -ftzero, ftzero) + ftzero
    return v.at[:, 0].set(ftzero).at[:, -1].set(ftzero)


def _bt_channel_cost(p1row: jnp.ndarray, p2row: jnp.ndarray, ndisp: int, mindisp: int) -> jnp.ndarray:
    """Birchfield-Tomasi cost between two single-channel images.

    Returns (H, W, D) with cost[y, x, d] = BT(left[y, x], right[y, x-d-mindisp]);
    out-of-range right samples clamp to column 0 (those columns are outside
    the cv2 valid region and are sliced away by the caller).
    """
    H, W = p1row.shape

    def half_extrema(a):
        left = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        vl = (a + left) // 2
        vr = (a + right) // 2
        # cv2 edge rule: at x=0 there is no left half-sample, at W-1 no right.
        vl = vl.at[:, 0].set(a[:, 0])
        vr = vr.at[:, -1].set(a[:, -1])
        v0 = jnp.minimum(jnp.minimum(vl, vr), a)
        v1 = jnp.maximum(jnp.maximum(vl, vr), a)
        return v0, v1

    u0, u1 = half_extrema(p1row)

    maxshift = mindisp + ndisp - 1
    pad = lambda a: jnp.pad(a, ((0, 0), (maxshift, 0)), mode="edge")
    # Clamp semantics: pad the VALUE row first, then take half-extrema —
    # out-of-range right samples behave as a constant-replicated signal.
    # (cv2 never evaluates x - d < 0 at all — those columns are outside
    # its valid region — so either clamp convention preserves parity; this
    # one matches the Pallas cost kernel's single-stack derivation
    # exactly.)
    v_p = pad(p2row)
    v0_p, v1_p = half_extrema(v_p)

    def per_d(d):
        off = maxshift - (mindisp + d)
        sl = lambda a: jax.lax.dynamic_slice(a, (0, off), (H, W))
        v, vv0, vv1 = sl(v_p), sl(v0_p), sl(v1_p)
        c0 = jnp.maximum(jnp.maximum(0, p1row - vv1), vv0 - p1row)
        c1 = jnp.maximum(jnp.maximum(0, v - u1), u0 - v)
        # Per-pixel BT cost <= 2*255; int16 halves the volume traffic
        # (the windowed sum stays < 12k, still int16-safe).
        # (A conv_general_dilated_patches window formulation was tried and
        # measured SLOWER on TPU than these fused static slices.)
        return jnp.minimum(c0, c1).astype(jnp.int16)

    return jax.vmap(per_d, out_axes=-1)(jnp.arange(ndisp))  # (H, W, D) int16


def _box_filter_same(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    """bs x bs box sum over the first two axes, replicate-padded (cv2 clamp).

    Implemented as bs static-shift adds per axis (separable): for SGBM
    block sizes (3-11) this fuses into one read pass per axis, unlike
    cumsum, which XLA lowers to O(log n) full-volume passes.
    """
    r = bs // 2
    rest = ((0, 0),) * (x.ndim - 2)
    xp = jnp.pad(x, ((r, r),) + ((0, 0),) + rest, mode="edge")
    H = x.shape[0]
    y = xp[0:H]
    for k in range(1, bs):
        y = y + xp[k : k + H]
    yp = jnp.pad(y, ((0, 0), (r, r)) + rest, mode="edge")
    W = x.shape[1]
    out = yp[:, 0:W]
    for k in range(1, bs):
        out = out + yp[:, k : k + W]
    return out


def _sgm_update(c, L, minL, P1, P2):
    """One SGM step: L' = c + min(L, L(d-1)+P1, L(d+1)+P1, minL+P2) - minL."""
    Lm = jnp.concatenate([jnp.full_like(L[..., :1], _BIG), L[..., :-1]], axis=-1)
    Lp = jnp.concatenate([L[..., 1:], jnp.full_like(L[..., :1], _BIG)], axis=-1)
    cand = jnp.minimum(jnp.minimum(L, minL + P2), jnp.minimum(Lm, Lp) + P1)
    Lnew = c + cand - minL
    return Lnew, jnp.min(Lnew, axis=-1, keepdims=True)


def _shift_cols(a, direction):
    """Shift along the column axis (axis -2 of a (..., W, D) array), zero-fill."""
    if direction == 0:
        return a
    z = jnp.zeros_like(a[..., :1, :])
    if direction > 0:  # predecessor at x-1: value for column x comes from x-1
        return jnp.concatenate([z, a[..., :-1, :]], axis=-2)
    return jnp.concatenate([a[..., 1:, :], z], axis=-2)


def _aggregate_down(C2, P1, P2, with_diagonals: bool = True):
    """Sum of the downward direction volumes: (0,1) plus, when
    ``with_diagonals``, (1,1) and (-1,1).

    C2: (2, H, W, D) int32 — the volume and its y-flip stacked, so the
    downward and upward direction sets run in ONE scan (each step does 2x
    the vector work instead of compiling a second scan; the flipped
    output is un-flipped by the caller). Returns (2, H, W, D).
    """
    _, _, W, D = C2.shape
    zero = jnp.zeros((2, W, D), C2.dtype)
    zmin = jnp.zeros((2, W, 1), C2.dtype)

    def step(carry, c_row):
        (Lv, mv), (Ld, md), (Lu, mu) = carry
        Lv2, mv2 = _sgm_update(c_row, Lv, mv, P1, P2)
        if with_diagonals:
            Ld2, md2 = _sgm_update(c_row, _shift_cols(Ld, 1), _shift_cols(md, 1), P1, P2)
            Lu2, mu2 = _sgm_update(c_row, _shift_cols(Lu, -1), _shift_cols(mu, -1), P1, P2)
            out = Lv2 + Ld2 + Lu2
        else:
            Ld2, md2, Lu2, mu2 = Ld, md, Lu, mu
            out = Lv2
        return (((Lv2, mv2), (Ld2, md2), (Lu2, mu2)), out)

    init = ((zero, zmin), (zero, zmin), (zero, zmin))
    _, S = jax.lax.scan(step, init, jnp.moveaxis(C2, 1, 0))
    return jnp.moveaxis(S, 0, 1)


def _aggregate_horiz(C2, P1, P2):
    """Left-to-right direction volume for (2, H, W, D) stacked volumes
    (the volume and its x-flip), one scan over columns."""
    _, H, _, D = C2.shape
    zero = jnp.zeros((2, H, D), C2.dtype)
    zmin = jnp.zeros((2, H, 1), C2.dtype)

    def step(carry, c_col):
        L, m = carry
        L2, m2 = _sgm_update(c_col, L, m, P1, P2)
        return ((L2, m2), L2)

    _, S = jax.lax.scan(step, (zero, zmin), jnp.moveaxis(C2, 2, 0))
    return jnp.moveaxis(S, 0, 2)


def _aggregate_8(C, P1, P2, backend: str = "scan", num_paths: int = 8):
    """Aggregated cost volume: 8 directions (MODE_HH parity), 4
    (fast mode — vertical + horizontal), 3 (+ L->R only) or 2
    (vertical pair only; used by hierarchical coarse passes where the
    prior only needs +-granularity accuracy).

    backend 'scan' runs the lax.scan reference; 'pallas' runs the VMEM-
    resident TPU kernels (stereo_vision_tpu.stereo.sgm_pallas), which are
    bit-identical; 'auto' picks pallas on TPU backends. num_paths < 4 is
    scan-only (the exact Pallas kernels ship 4/8-path).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "scan"
    if backend == "pallas" and num_paths >= 4:
        from stereo_vision_tpu.stereo.sgm_pallas import aggregate_8_pallas

        return aggregate_8_pallas(C, int(P1), int(P2), num_paths=num_paths)
    C = C.astype(jnp.int32)  # scan path accumulates in int32
    Sv = _aggregate_down(
        jnp.stack([C, jnp.flip(C, 0)]), P1, P2, with_diagonals=num_paths >= 8
    )
    S = Sv[0] + jnp.flip(Sv[1], 0)
    if num_paths < 3:
        return S
    Sh = _aggregate_horiz(jnp.stack([C, jnp.flip(C, 1)]), P1, P2)
    if num_paths == 3:
        return S + Sh[0]
    return S + Sh[0] + jnp.flip(Sh[1], 1)


def compute_pixel_cost(left: jnp.ndarray, right: jnp.ndarray, params: StereoSGBMParams) -> jnp.ndarray:
    """(H, W, D) per-pixel (unwindowed) BT cost (sobel + raw>>2 channels)."""
    ftzero = params.ftzero
    ndisp = params.num_disparities
    mindisp = params.min_disparity
    ls = _xsobel_clipped(left, ftzero)
    rs = _xsobel_clipped(right, ftzero)
    c_sobel = _bt_channel_cost(ls, rs, ndisp, mindisp)
    c_raw = _bt_channel_cost(left.astype(jnp.int32), right.astype(jnp.int32), ndisp, mindisp)
    pix = c_sobel + (c_raw >> 2)  # int16; <= ~190+63 per pixel
    if params.block_size > 11:  # bs^2 * 253 would overflow int16
        pix = pix.astype(jnp.int32)
    return pix


def compute_cost_volume(left: jnp.ndarray, right: jnp.ndarray, params: StereoSGBMParams) -> jnp.ndarray:
    """(H, W, D) windowed BT cost (sobel channel + raw>>2 channel)."""
    pix = compute_pixel_cost(left, right, params)
    return _box_filter_same(pix, params.block_size)


def sgbm_stats(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams,
    min_x: int | None = None,
):
    """Cost build + aggregation + WTA on columns ``x >= min_x``.

    The reusable core of :func:`stereo_sgbm` — the hierarchical mode
    (stereo_vision_tpu.stereo.hier) runs it on a prior-warped pair with a
    band-sized ``num_disparities`` but the FULL-range ``min_x``.

    Returns ``(minS, best, sm, s0, sp, unique_ok)`` int32/bool maps of
    shape ``(H, W - min_x)``.
    """
    H, W = left.shape
    ndisp = params.num_disparities
    mindisp = params.min_disparity
    maxD = mindisp + ndisp
    minX1 = max(maxD, 0) if min_x is None else int(min_x)
    P1, P2 = params.P1, params.P2

    backend = params.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "scan"

    if backend == "pallas" and mindisp == 0:
        # Fused Pallas cost kernel, emitting only the cv2 valid x range
        # directly (exact vs compute_cost_volume sliced; the XLA
        # diagonal-read formulation costs ~28 ms/frame at 720p/D=128).
        from stereo_vision_tpu.stereo.cost_pallas import cost_volume_pallas

        ftz = params.ftzero
        x_off = minX1 if minX1 % 8 == 0 else 0
        C = cost_volume_pallas(
            _xsobel_clipped(left, ftz),
            _xsobel_clipped(right, ftz),
            left.astype(jnp.int32),
            right.astype(jnp.int32),
            ndisp=ndisp,
            block_size=params.block_size,
            x_offset=x_off,
        )
        if x_off != minX1:
            C = C[:, minX1:, :]
    else:
        C_full = compute_cost_volume(left, right, params)  # (H, W, D)
        C = C_full[:, minX1:, :]  # cv2 aggregates only the valid x range

    if backend == "pallas" and params.num_paths >= 4:
        # Fused aggregation + WTA: the four direction partial volumes feed
        # the stats kernel directly — S never materializes (sgm_pallas).
        # num_paths < 4 routes to the scan aggregation below (the exact
        # Pallas reduce always runs both horizontal scans; silently
        # summing 4 paths for a 3-path request would diverge from the
        # scan backend — the banded kernels, not these, are the fast
        # 2/3-path TPU path).
        from stereo_vision_tpu.stereo.sgm_pallas import sgm_reduce_pallas

        # NOTE: int16 direction volumes (cost_bound=bs^2*(2*ftzero+63)) were
        # measured ~10% SLOWER on v5e — the scans are dependency-chain
        # bound and the f32<->int16 packing lengthens the critical path —
        # so the volumes stay f32 (int16 is kept gated in sgm_reduce for
        # future hardware).
        minS_f, best_f, sm_f, s0_f, sp_f, uok_f = sgm_reduce_pallas(
            C, P1, P2, params.uniqueness_ratio, num_paths=params.num_paths
        )
        minS = minS_f.astype(jnp.int32)
        best = best_f.astype(jnp.int32)
        sm = sm_f.astype(jnp.int32)
        s0 = s0_f.astype(jnp.int32)
        sp = sp_f.astype(jnp.int32)
        unique_ok = uok_f > 0.5
    else:
        S = _aggregate_8(C, P1, P2, backend=backend, num_paths=params.num_paths)
        minS, best, sm, s0, sp, unique_ok = wta_scan(S, ndisp, params.uniqueness_ratio)

    return minS, best, sm, s0, sp, unique_ok


def wta_scan(S: jnp.ndarray, ndisp: int, uniqueness_ratio: int):
    """WTA + uniqueness + subpixel samples from an aggregated volume
    (scan-backend reference; the Pallas WTA kernels are bit-identical)."""
    best = jnp.argmin(S, axis=-1)  # ties -> smallest d (cv2 scan order)
    minS = jnp.min(S, axis=-1)

    # Uniqueness: minS*(100+U) > S[d]*100 for |d - best| > 1 -> invalid.
    ds = jnp.arange(ndisp).reshape(1, 1, ndisp)
    if uniqueness_ratio > 0:
        offender = (
            minS[..., None] * (100 + uniqueness_ratio) > S * 100
        ) & (jnp.abs(ds - best[..., None]) > 1)
        unique_ok = ~jnp.any(offender, axis=-1)
    else:
        unique_ok = jnp.ones_like(best, dtype=bool)

    d0 = jnp.clip(best, 1, ndisp - 2)
    take = lambda i: jnp.take_along_axis(S, i[..., None], axis=-1)[..., 0]
    s0, sm, sp = take(d0), take(d0 - 1), take(d0 + 1)
    return minS, best, sm, s0, sp, unique_ok


def subpixel_disp16(best, sm, s0, sp, ndisp: int):
    """cv2 subpixel parabola (integer semantics, DISP_SCALE = 16):
    d*16 + ((S[d-1]-S[d+1])*16 + denom2) / (denom2*2), C integer division.
    Returns the 16x fixed-point disparity (int32).

    The C division is computed WITHOUT integer division (int32 `//` has
    no TPU hardware path — its XLA lowering was 0.48 ms/pack of the
    hier headline, the single most expensive glue op in the r3n trace):
    s0 is the WTA minimum, so |sm - sp| <= (sm - s0) + (sp - s0) =
    denom2 unclamped, hence num = (sm - sp)*16 + denom2 lies in
    [-15, 17] * denom2 and the quotient magnitude is <= 8 — eight
    compare-accumulates on |num| give floor(|num| / den) exactly
    (exhaustive check: tests/test_banded_pallas.py::
    TestFusedSubpixelDivision). f32 arithmetic is exact here: every
    operand is an integer below 2^24 (8-path S <= 8 * (cost_max + P2)
    ~ 1.1e5, so num <= 17 * 2 * Smax ~ 3.7e6 and 8 * den ~ 3.5e6)."""
    denom2 = jnp.maximum(sm + sp - 2 * s0, 1).astype(jnp.float32)
    num = (sm - sp).astype(jnp.float32) * 16.0 + denom2
    den = 2.0 * denom2
    anum = jnp.abs(num)
    qa = jnp.zeros_like(anum)
    for c in range(1, 9):
        qa = qa + (anum >= float(c) * den).astype(jnp.float32)
    q = jnp.where(num < 0.0, -qa, qa).astype(jnp.int32)
    return jnp.where(
        (best > 0) & (best < ndisp - 1),
        best * 16 + q,
        best * 16,
    )


def lr_fail(
    minS: jnp.ndarray,
    best: jnp.ndarray,
    disp: jnp.ndarray,
    *,
    W: int,
    min_x: int,
    ndisp: int,
    mindisp: int,
    max_diff: int,
    backend: str = "scan",
) -> jnp.ndarray:
    """cv2 LR-consistency failure mask on the valid-region maps.

    ``best`` is the integer WTA disparity (absolute, without mindisp
    added), ``disp`` the float disparity (with mindisp). ``ndisp`` is the
    FULL disparity range — for hierarchical/banded modes this exceeds the
    band the stats were computed over.
    """
    H, Wv = minS.shape
    maxD = mindisp + ndisp
    minX1 = min_x

    if backend == "pallas":
        from stereo_vision_tpu.stereo.lr_pallas import lr_fail_pallas

        d_f = jnp.floor(disp).astype(jnp.int32)
        d_c = jnp.ceil(disp).astype(jnp.int32)
        return lr_fail_pallas(
            minS.astype(jnp.int32), best.astype(jnp.int32), d_f, d_c,
            W, ndisp, mindisp, max_diff,
        )
    else:
        # disp2[x2] = argmin-cost disparity among left pixels x = x2 + d
        # whose WTA winner is exactly d (cv2's packed projection). The
        # reference formulation is a scatter-min; scatters serialize on
        # TPU, so build it as D static shifts + a min-reduce instead.
        assert ndisp + abs(mindisp) < (1 << 11), "disparity exceeds pack field"
        assert mindisp >= 0, "gather LR-check assumes min_disparity >= 0"
        pack = (minS.astype(jnp.int32) * (1 << 11) + (best + mindisp)).astype(jnp.int32)
        sentinel = jnp.int32(1 << 30)
        # Left-pixel arrays in full-frame x; pad so x2 + d slices statically.
        pack_full = jnp.full((H, W + maxD), sentinel, jnp.int32)
        pack_full = jax.lax.dynamic_update_slice(pack_full, pack, (0, minX1))
        best_full = jnp.full((H, W + maxD), -1, jnp.int32)
        best_full = jax.lax.dynamic_update_slice(
            best_full, best.astype(jnp.int32), (0, minX1)
        )

        # Running min over D STATIC slices: each right pixel x2 reads the
        # contiguous window pack_full[:, x2 .. x2+D-1], which XLA fuses
        # into one vectorized pass. (A vmap'd dynamic_slice formulation
        # lowers to a gather materializing a (D, H, W) volume — measured
        # ~21 ms of the 720p/D=128 frame, vs ~1 ms for this form.)
        packed = jnp.full((H, W), sentinel, jnp.int32)
        for d in range(ndisp):
            off = d + mindisp
            pk = pack_full[:, off : off + W]
            bs_ = best_full[:, off : off + W]
            packed = jnp.minimum(packed, jnp.where(bs_ == d, pk, sentinel))
        disp2 = (packed & ((1 << 11) - 1)).astype(jnp.int32)
        disp2 = jnp.where(packed >= sentinel, -(1 << 10), disp2)

        d_f = jnp.floor(disp).astype(jnp.int32)
        d_c = jnp.ceil(disp).astype(jnp.int32)  # == d_f when disp is integral

        # Gather-free lookup of disp2[y, x - dd] for dd in {d_f, d_c}: a
        # per-pixel gather costs ~24 ms on TPU at this size; D+2 static
        # shifts + selects cost ~5 ms. Out-of-range columns read the
        # -(1<<10) pad, which fails the v >= mindisp test — identical to
        # the explicit ok_range mask.
        oob = jnp.int32(-(1 << 10))
        padl = maxD + 1
        d2p = jnp.concatenate(
            [jnp.full((H, padl), oob, jnp.int32), disp2,
             jnp.full((H, 1), oob, jnp.int32)], axis=1
        )
        v_f = jnp.full((H, Wv), oob, jnp.int32)
        v_c = jnp.full((H, Wv), oob, jnp.int32)
        for dd in range(mindisp - 1, maxD + 1):
            # valid column x_v sits at full-frame x = x_v + minX1
            sh = d2p[:, padl + minX1 - dd : padl + minX1 - dd + Wv]
            v_f = jnp.where(d_f == dd, sh, v_f)
            v_c = jnp.where(d_c == dd, sh, v_c)

        fail_f = (v_f >= mindisp) & (jnp.abs(v_f - d_f) > max_diff)
        fail_c = (v_c >= mindisp) & (jnp.abs(v_c - d_c) > max_diff)
        return fail_f & fail_c


def stereo_sgbm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams = StereoSGBMParams(),
) -> jnp.ndarray:
    """Dense SGBM disparity (cv2.StereoSGBM MODE_HH parity).

    Args:
      left, right: (H, W) uint8/int grayscale rectified pair.

    Returns:
      (H, W) float32 disparity; invalid = ``min_disparity - 1``.
    """
    H, W = left.shape
    ndisp = params.num_disparities
    mindisp = params.min_disparity
    minX1 = max(mindisp + ndisp, 0)

    backend = params.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "scan"

    minS, best, sm, s0, sp, unique_ok = sgbm_stats(left, right, params)

    sub16 = subpixel_disp16(best, sm, s0, sp, ndisp)
    disp = sub16.astype(jnp.float32) / 16.0 + mindisp

    valid = unique_ok
    if params.disp12_max_diff >= 0:
        valid = valid & ~lr_fail(
            minS, best, disp,
            W=W, min_x=minX1, ndisp=ndisp, mindisp=mindisp,
            max_diff=params.disp12_max_diff,
            # The exact path keeps the XLA chains (measured no Pallas win
            # at full D; _LR_PALLAS flips it for A/B).
            backend=backend if _LR_PALLAS else "scan",
        )

    invalid_val = float(mindisp - 1)
    disp = jnp.where(valid, disp, jnp.float32(invalid_val))

    # Paste back into full width; x < minX1 has no full disparity range.
    full = jnp.full((H, W), invalid_val, jnp.float32)
    full = jax.lax.dynamic_update_slice(full, disp, (0, minX1))

    if params.speckle_window_size > 0:
        full = speckle_filter(
            full,
            max_diff=float(params.speckle_range),
            max_speckle_size=params.speckle_window_size,
            invalid_value=invalid_val,
        )
    return full


stereo_sgbm_jit = jax.jit(stereo_sgbm, static_argnames=("params",))
