"""Pallas TPU kernels for the banded SGBM core, lane-packed P frames deep.

Why packing: Mosaic tiles vector registers as (8 sublanes, 128 lanes).
A band of K = 32 disparities occupies only 32 lanes, so un-packed banded
kernels run at 1/4 lane utilization and measure NO faster than full-D
(hier on v5e: 27.6 ms vs 26.3 full — the banding saved nothing). These
kernels pack P = 128/K frames into the lane dimension, b-minor:

    lane l = P*k + b     (k = band lane, b = frame index)

which makes every band operation a native full-width vector op:
  - band shift k -> k+1  ==  lane shift by P (concat, no masks),
  - per-frame min over k ==  log2(K) full-lane ROTATIONS by P*2^j
    (rotation moves P*k+b -> P*((k+s) mod K)+b: frames never mix, and
    the result is broadcast to every lane of the group for free),
  - shift-map alignment by G disparities == lane shift by P*G + a
    per-frame select.

Batch=P is the natural shape for the throughput bench and the streaming
pipeline; the same kernels also serve the coarse pass (s = 0).

Semantics are bit-identical to stereo_vision_tpu.stereo.banded's lax.scan
reference (tests/test_banded_pallas.py asserts exact equality), with all
arithmetic in float32 (exact for these integer magnitudes; v5e Mosaic
has no int16 vector arithmetic — see stereo/sgm_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FILL = 1.0e6


# ---------------------------------------------------------------------------
# packed-lane primitives (all on (..., 128) float32 blocks)
# ---------------------------------------------------------------------------


def _lane_iota(a):
    return jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)


def _rot_min(a, P, K, op=jnp.minimum):
    """Per-frame reduction over k via log2(K) full-lane rotations; the
    result is replicated across each frame's K lanes.

    pltpu.roll, NOT slice+concat: Mosaic lowers lane concats as costly
    relayouts while tpu.rotate is ~1 op (the native jnp.min reduction is
    itself a 7-op rotate tree) — the concat version measured ~4x slower.
    """
    m = a
    s = P
    L = a.shape[-1]
    while s < P * K:
        m = op(m, pltpu.roll(m, L - s, a.ndim - 1))  # out[l] = m[l + s]
        s *= 2
    return m


def _shift_k(a, dk_lanes, fill):
    """out[..., l] = a[..., l + dk_lanes] with constant fill (band edge).
    One native rotate + one iota select (see _rot_min on why not concat).
    """
    if dk_lanes == 0:
        return a
    L = a.shape[-1]
    n = abs(dk_lanes)
    if n >= L:
        return jnp.full_like(a, fill)
    lane = _lane_iota(a)
    if dk_lanes > 0:
        return jnp.where(lane >= L - n, fill, pltpu.roll(a, L - n, a.ndim - 1))
    return jnp.where(lane < n, fill, pltpu.roll(a, n, a.ndim - 1))


def _update_packed(c, L_aligned, P, K, P1, P2, may_miss=True):
    """Banded SGM update on packed lanes (mirrors banded._update_banded).

    minL is the per-frame rotation-min (replicated); a fully-out-of-band
    predecessor (minL >= _FILL) resets to the border rule L = c.
    ``may_miss=False`` skips the reset select — valid for every update
    whose predecessor was NOT re-aligned (its L always contains finite
    values), i.e. all but the first step of a tile block.
    """
    minL = _rot_min(L_aligned, P, K)
    if may_miss:
        full_miss = minL >= _FILL
        minL = jnp.where(full_miss, 0.0, minL)
    Lm = _shift_k(L_aligned, -P, _FILL)
    Lp = _shift_k(L_aligned, P, _FILL)
    cand = jnp.minimum(
        jnp.minimum(L_aligned, minL + P2), jnp.minimum(Lm, Lp) + P1
    )
    out = c + cand - minL
    if may_miss:
        out = jnp.where(full_miss, c, out)
    return out


def _align_packed(L, delta_lanes, P, K, G, diag=False):
    """Alignment by the packed per-pixel delta map (values are actual
    band-lane deltas, multiples of G). Supported shifts {-G, 0, +G}
    (+-2G when diag and 2G < K); larger deltas -> full fill (reset)."""
    out = L
    units = [-1, 1]
    if diag and 2 * G < K:
        units += [-2, 2]
    for u in units:
        out = jnp.where(delta_lanes == u * G, _shift_k(L, u * P * G, _FILL), out)
    maxsup = max(units) * G
    return jnp.where(jnp.abs(delta_lanes) > maxsup, _FILL, out)


# ---------------------------------------------------------------------------
# banded pixel-cost kernel
# ---------------------------------------------------------------------------


def _pack_mm(vals, P):
    """(P, n) per-frame values -> (n, 128) b-minor packed broadcast via
    ONE MXU contraction with the 0/1 tile matrix E[b, l] = (l % P == b)
    (dot_general contracting dim 0 of both — no explicit transpose).

    Exact in the default bf16 MXU pass: every packed value here is an
    integer <= 255 (image levels, extrema, shift deltas), and E is 0/1.
    Replaces a 4-broadcast + 4-select chain (~8 VPU ops over the full
    width) per packed row — the chains were ~half the pix kernel's time.

    The (P, n) orientation is load-bearing: per-frame operands enter the
    kernels as (1, P, width) blocks, sublane-padded 4->8 (2x). The
    transposed (1, width, P) blocks put P on the LANE axis, and XLA
    materializes every such intermediate tile-padded P=4 -> 128 (32x):
    feeding the pix kernel that way measured 12.5 ms/frame vs 3.1 for
    this layout, identical kernel math.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    E = (lane % P == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        vals.astype(jnp.float32), E, (((0,), (0,)), ((), ()))
    )




def _pix_kernel(
    P, K, D, G, ftz, stride, H, W, Wv, x0, Wp,
    lm1_ref, l0_ref, lp1_ref, rm1_ref, r0_ref, rp1_ref, s_ref,
    out_ref,
):
    """Grid step y: emit the banded per-pixel BT cost row (1, Wv, 128).

    Inputs are RAW image rows y-1/y/y+1 (clamped at the image border =
    sobel's replicate rule) as (1, P, width) frame-major blocks — the 3-D
    layout makes single-row blocks legal, P rides the SUBLANE axis (pad
    4->8, 2x; lane-axis P would tile-pad 4->128, 32x — see _pack_mm),
    and the (P, W) slabs feed _pack_mm directly.

    Valid-region trim: only columns x >= x0 are emitted (Wv = W - x0;
    x0 = min_x - 8, 8-aligned). The aggregation consumes columns
    x >= min_x only (banded.banded_stats_scan slices the cost volume
    before aggregating), and its 5x5 box input needs pix exact down to
    min_x - 2 — the left slabs arrive pre-sliced to x >= x0 and the
    left-side ops, the s-select loop (the kernel's dominant block), and
    the BT math all run Wv wide. Columns x0..x0+1 inherit replicate
    sobel/extrema at the trim edge; they only reach box outputs below
    min_x - 5, which nothing reads. RIGHT rows stay full-width (cost at
    x needs right samples down to x - D).

    Sobel, BT half-extrema, and the D-lane replicate pad of the right
    row are ALL derived in-kernel on the packed sublane-major layout
    (x shifts are cheap sublane concats there): the XLA prep that used
    to build 8 materialized (P, H, W[+D+1]) arrays measured
    0.95 ms/frame — ~15 unfused HBM passes against a ~0.1 ms floor
    (benchmarks/prep_split_bench.py / bw_probe.py). Bit-exact: packed
    operands are raw ints <= 255 (within bf16's mantissa), and every
    derived value (sobel <= 2*ftz, row sums <= 1020, halved extrema) is
    an exact f32 integer.
    """

    def pack(ref):
        return _pack_mm(ref[0], P)

    xi = jax.lax.broadcasted_iota(jnp.int32, (Wv, 128), 0)
    xi_r = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)

    def sobel(m1, p0, p1, border):
        # dx is linear: apply it once to t = up + 2*mid + down.
        t = m1 + 2.0 * p0 + p1
        d = _shift_rows(t, 1) - _shift_rows(t, -1)  # t[x+1] - t[x-1]
        v = jnp.clip(d, -float(ftz), float(ftz)) + float(ftz)
        return jnp.where(border, float(ftz), v)

    def extrema(a):
        # cv2 BT half-sample extrema along x (cf. sgbm._bt_channel_cost).
        # Image-border selects use absolute x (xi + x0); the replicate
        # value at the trim edge x0 > 0 equals the border rule anyway.
        vl = jnp.floor((a + _shift_rows(a, -1)) * 0.5)
        vr = jnp.floor((a + _shift_rows(a, 1)) * 0.5)
        vl = jnp.where(xi + x0 == 0, a, vl)
        vr = jnp.where(xi + x0 == W - 1, a, vr)
        return (
            jnp.minimum(jnp.minimum(vl, vr), a),
            jnp.maximum(jnp.maximum(vl, vr), a),
        )

    l0p = pack(l0_ref)
    r0p = pack(r0_ref)
    ls = sobel(
        pack(lm1_ref), l0p, pack(lp1_ref),
        (xi + x0 == 0) | (xi + x0 == W - 1),
    )
    rs = sobel(pack(rm1_ref), r0p, pack(rp1_ref), (xi_r == 0) | (xi_r == W - 1))

    # Shift values at the CENTER pixel (the select mask for all three
    # neighbor samples: vl/vr belong to disparity s(x)+k, so the x-1/x+1
    # samples must use s(x), not their own column's s — selecting each
    # row by its own s breaks the BT half-extrema at tile transitions).
    s_c = pack(s_ref)[1 : Wv + 1]

    # COMBINED-channel right row: encode (sobel, raw) as sob + 1024*raw —
    # exact f32 integers <= 2^18 — so the k-shift stack build and the
    # per-column s-alignment selects (the kernel's dominant vector-op
    # blocks) run ONCE for both BT channels instead of twice.
    v_row = rs + 1024.0 * r0p

    # Replicate-pad D left / 1 right (sublane concat is cheap in this
    # layout; the old host-side pad materialized a (P, H, W + D + 1)
    # array per channel), then stack St[x', k] = row_p[x' - k] over the
    # (Wp, 128) packed workspace via log2(K) masked sublane shifts —
    # identical structure to cost_pallas._build_shifted, with the lane
    # mask on k = lane // P.
    B = jnp.concatenate(
        [jnp.broadcast_to(v_row[:1], (D, 128)), v_row, v_row[-1:]], axis=0
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (Wp, 128), 1)
    k_lane = lane // P
    shift = 1
    while shift < K:
        n = stride * shift  # lane k means disparity s + stride*k
        z = jnp.zeros((n, 128), B.dtype)
        shifted = jnp.concatenate([z, B[:-n]], axis=0)
        B = jnp.where((k_lane & shift) != 0, shifted, B)
        shift *= 2
    # Per-column s-select: {Em, M, Ep}[x, k] = St[x + x0 + D - s(x) + {-1,0,1}]
    # Two forms. The direct loop runs (D-K)/G + 1 iterations of compare
    # + 3 selects — PACK-constant cost that made G=1 lose its band-4
    # quality win on the chip (docs/sgbm_roofline.md "Round 5a"). The
    # two-stage form factors s = 4q + r (r in {0, G, .., 4-G}): the
    # q-loop gathers 4 + 2 consecutive-offset maps in (D-K)/4 + 1
    # iterations (ONE compare per iteration, the maps share one slice),
    # then r resolves with (4/G - 1) selects per target — ~2.4x fewer
    # vector ops at G=1, ~1.35x at G=2. Exact: s, q, r are small f32
    # integers and every pick is a static slice + select.
    two_stage = G < 4 and 4 % G == 0 and stride == 1 and (D - K) >= 8
    if two_stage:
        r_c = s_c - jnp.floor(s_c * 0.25) * 4.0
        q_c = s_c - r_c
        tlo = -1 - (4 - G)  # smallest needed offset: -1 - max residual
        nmaps = 2 - tlo  # t in [tlo, 1]: 5 maps at G=2, 6 at G=1
        U = None
        for jq in range(0, (D - K) // 4 + 1):
            offq = x0 + D - 4 * jq + tlo
            slq = B[offq : offq + Wv + nmaps - 1]
            if U is None:
                U = [slq[i : i + Wv] for i in range(nmaps)]
            else:
                hitq = q_c == float(4 * jq)
                U = [
                    jnp.where(hitq, slq[i : i + Wv], u)
                    for i, u in enumerate(U)
                ]

        def pick(tbase):
            out = U[tbase - tlo]  # r == 0
            for r in range(G, 4, G):
                out = jnp.where(r_c == float(r), U[tbase - r - tlo], out)
            return out

        Em, M, Ep = pick(-1), pick(0), pick(1)
    else:
        Em = M = Ep = None
        for j in range(0, (D - K) // G + 1):
            off = x0 + D - j * G - 1
            sl = B[off : off + Wv + 2]
            if Em is None:
                Em, M, Ep = sl[0:Wv], sl[1 : Wv + 1], sl[2 : Wv + 2]
            else:
                hit = s_c == float(j * G)
                Em = jnp.where(hit, sl[0:Wv], Em)
                M = jnp.where(hit, sl[1 : Wv + 1], M)
                Ep = jnp.where(hit, sl[2 : Wv + 2], Ep)

    def split(c):
        """combined value -> (sobel part, raw part); 2^-10 is a power of
        two so the scale and floor are exact."""
        r_part = jnp.floor(c * (1.0 / 1024.0))
        return c - 1024.0 * r_part, r_part

    Em_s, Em_r = split(Em)
    M_s, M_r = split(M)
    Ep_s, Ep_r = split(Ep)

    def bt_cost(M_, Em_, Ep_, l_row, u0_row, u1_row):
        vl = jnp.floor((M_ + Em_) * 0.5)
        vr = jnp.floor((M_ + Ep_) * 0.5)
        v0 = jnp.minimum(jnp.minimum(vl, vr), M_)
        v1 = jnp.maximum(jnp.maximum(vl, vr), M_)
        c0 = jnp.maximum(jnp.maximum(0.0, l_row - v1), v0 - l_row)
        c1 = jnp.maximum(jnp.maximum(0.0, M_ - u1_row), u0_row - M_)
        return jnp.minimum(c0, c1)

    c_sob = bt_cost(M_s, Em_s, Ep_s, ls, *extrema(ls))
    c_raw = bt_cost(M_r, Em_r, Ep_r, l0p, *extrema(l0p))
    out_ref[0] = (c_sob + jnp.floor(c_raw / 4.0)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ndisp", "band", "granularity", "ftzero", "stride", "x0", "interpret"
    ),
)
def banded_pixel_cost_pack(
    left, right, s,
    ndisp: int, band: int, granularity: int, ftzero: int = 15,
    stride: int = 1, x0: int = 0, interpret: bool = False,
) -> jnp.ndarray:
    """Packed banded per-pixel BT cost, straight from the RAW images.

    Args:
      left, right: (P, H, W) int images (<= 255 levels).
      s: (P, H, W + 2) edge-padded shift maps (int).
      x0: first emitted column (8-aligned; callers pass min_x - 8 so the
        box window's support at x >= min_x stays exact — see _pix_kernel).

    Sobel, half-extrema, and right-row padding happen inside the kernel
    (see _pix_kernel) — no prepped intermediates touch HBM.

    Returns:
      (H, W - x0, 128) int16, lane P*k + b = cost of frame b at column
      x0 + x and disparity s_b(y, x0 + x) + k.
    """
    P, H, W = left.shape
    K = band
    assert P * K == 128
    assert x0 >= 0 and x0 % 8 == 0
    D, G = ndisp, granularity
    Wv = W - x0
    Wp = W + D + 1

    # Frame-major (H, P, width) layout: single-row blocks are legal 3-D
    # blocks, feed the MXU packer directly, and keep P on the sublane
    # axis (see _pack_mm on why lane-axis P costs 32x tile padding).
    hpw = lambda a: jnp.moveaxis(a, 0, 1).astype(jnp.int32)
    l_t, r_t, s_in = hpw(left)[:, :, x0:], hpw(right), hpw(s)[:, :, x0 : x0 + Wv + 2]

    def spec_dy(dy, width):
        return pl.BlockSpec(
            (1, P, width),
            lambda y, dy=dy: (jnp.clip(y + dy, 0, H - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, Wv, 128), lambda y: (y, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _pix_kernel, P, K, D, G, ftzero, stride, H, W, Wv, x0, Wp
    )
    return pl.pallas_call(
        kern,
        grid=(H,),
        in_specs=[spec_dy(d, Wv) for d in (-1, 0, 1)]
        + [spec_dy(d, W) for d in (-1, 0, 1)]
        + [spec_dy(0, Wv + 2)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, Wv, 128), jnp.int16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(l_t, l_t, l_t, r_t, r_t, r_t, s_in)


# ---------------------------------------------------------------------------
# fused box downsample (the hier coarse pass's image pyramid)
# ---------------------------------------------------------------------------


def _downsample_kernel(P, f, W, Wc, rpb, in_ref, out_ref):
    """Grid step r: rpb = 8/f output rows from the 8 raw rows 8r..8r+7.

    Row sums (<= 255f, exact f32 ints) then ONE 0/1 pool contraction
    E[w, wc] = (w // f == wc) per output row; sums <= 255f^2 exceed
    bf16's mantissa, so the dot runs HIGHEST (exact f32). jnp.round is
    half-to-even, matching hier._downsample_box bit-for-bit.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (W, Wc), 0)
    out_c = jax.lax.broadcasted_iota(jnp.int32, (W, Wc), 1)
    E = (col // f == out_c).astype(jnp.float32)
    inv = 1.0 / (f * f)  # f is a power of two: the scale is exact
    for j in range(rpb):
        acc = in_ref[f * j].astype(jnp.float32)
        for i in range(1, f):
            acc = acc + in_ref[f * j + i].astype(jnp.float32)
        u = jax.lax.dot(acc, E, precision=jax.lax.Precision.HIGHEST)
        out_ref[j] = jnp.round(u * inv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def downsample_box_pack(img, f: int, interpret: bool = False) -> jnp.ndarray:
    """f x f box-mean downsample of a (P, H, W) int pack, rounded back to
    integer levels — fused Pallas form of hier._downsample_box
    (bit-identical, tests/test_banded_pallas.py::TestDownsamplePack).

    The XLA dot_general form spends ~20 unfused passes per image on
    converts/relayouts around the two contractions — measured 0.567
    ms/frame, HALF of the hier16 coarse+shift stage
    (benchmarks/coarse_split_bench.py, 2026-08-18); here the row sums
    and the 0/1 pool contraction run per 8-row block in VMEM.

    Requires f | 8 and H % 8 == 0 (callers fall back to the matmul form
    otherwise). Trailing W % f columns are dropped, like the matmul form.
    """
    P, H, W = img.shape
    assert 8 % f == 0 and H % 8 == 0
    Wc, Hc, rpb = W // f, H // f, 8 // f
    x = jnp.moveaxis(img, 0, 1).astype(jnp.int32)  # (H, P, W), P on sublanes
    kern = functools.partial(_downsample_kernel, P, f, W, Wc, rpb)
    out = pl.pallas_call(
        kern,
        grid=(H // 8,),
        in_specs=[
            pl.BlockSpec((8, P, W), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rpb, P, Wc), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hc, P, Wc), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=16 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return jnp.moveaxis(out, 1, 0)


# ---------------------------------------------------------------------------
# aligned box filter (XLA: static shifts + selects, fused by the compiler)
# ---------------------------------------------------------------------------


def _align_window_packed(a, delta, center, P, G):
    """In-kernel window alignment (mirrors banded.align_window): lanes
    with no source after the +-G shift — band edges, or |delta| > G —
    substitute the CENTER pixel's value at that lane (one iota select)."""
    n = P * G
    L = a.shape[-1]
    lane = _lane_iota(a)
    up = jnp.where(lane >= L - n, center, pltpu.roll(a, L - n, a.ndim - 1))
    dn = jnp.where(lane < n, center, pltpu.roll(a, n, a.ndim - 1))
    out = jnp.where(delta == G, up, jnp.where(delta == -G, dn, a))
    return jnp.where(jnp.abs(delta) > G, center, out)


def _shift_rows(v, dx):
    """(W, 128) sublane shift: out[x] = v[x + dx], edge replicate."""
    if dx == 0:
        return v
    n = abs(dx)
    if dx > 0:
        edge = jnp.broadcast_to(v[-1:], (n,) + v.shape[1:])
        return jnp.concatenate([v[n:], edge], axis=0)
    edge = jnp.broadcast_to(v[:1], (n,) + v.shape[1:])
    return jnp.concatenate([edge, v[: v.shape[0] - n]], axis=0)


def _aligned_box_kernel(P, K, G, bs, H, W, out_off,
                        pm2_ref, pm1_ref, p0_ref, pp1_ref, pp2_ref, d_ref,
                        out_ref):
    """Grid step y: windowed banded cost row, fully aligned.

    pix rows stream via 5 clamped-index specs (image-border replicate).
    d_ref: (1, 8P, W) i32 — row deltas s(y)-s(y+dy), dy in (-2,-1,1,2),
    at slots 0..3; column deltas s(y,x)-s(y,x+dx), dx in (-2,-1,1,2), at
    slots 4..7 (sublane idx*P + b for frame b).

    out_off > 0 trims the emitted row to columns >= out_off (the
    valid-region crop the aggregation consumes — writing it here saves
    the XLA slice pass over the full volume).
    """

    def packd(idx):
        return _pack_mm(d_ref[0, idx * P : (idx + 1) * P, :], P)

    center = p0_ref[0].astype(jnp.float32)
    acc = center
    for i, ref in enumerate((pm2_ref, pm1_ref, pp1_ref, pp2_ref)):
        a = ref[0].astype(jnp.float32)
        acc = acc + _align_window_packed(a, packd(i), center, P, G)

    out = acc
    for i, dx in enumerate((-2, -1, 1, 2)):
        a = _shift_rows(acc, dx)
        out = out + _align_window_packed(a, packd(4 + i), acc, P, G)
    out_ref[0] = out[out_off:].astype(out_ref.dtype)


def _aligned_box_kernel_srows(
    P, K, G, bs, H, W, out_off,
    pm2_ref, pm1_ref, p0_ref, pp1_ref, pp2_ref,
    sm2_ref, sm1_ref, s0_ref, sp1_ref, sp2_ref,
    out_ref,
):
    """_aligned_box_kernel with the 8 delta maps derived IN-KERNEL from
    raw shift-map rows (5 clamped-index (1, P, W) specs, like the pix
    kernel's image rows).

    The precomputed d_ref path materializes an (H, 8P, W) i32 delta
    array (~236 MB/pack at 720p/P=8) plus its XLA construction passes;
    here the same deltas are 5 tiny row DMAs + 4 pack_mm + subtracts.
    Clamped row indices == edge-padded s (the d_ref formulation's pad);
    column deltas use _shift_rows edge replicate == sxe's edge pad.
    Bit-identical (tests/test_banded_pallas.py::TestBoxInKernelDeltas).
    """
    s_c = _pack_mm(s0_ref[0], P)

    center = p0_ref[0].astype(jnp.float32)
    acc = center
    for ref, sref in (
        (pm2_ref, sm2_ref), (pm1_ref, sm1_ref),
        (pp1_ref, sp1_ref), (pp2_ref, sp2_ref),
    ):
        a = ref[0].astype(jnp.float32)
        d = s_c - _pack_mm(sref[0], P)
        acc = acc + _align_window_packed(a, d, center, P, G)

    out = acc
    for dx in (-2, -1, 1, 2):
        a = _shift_rows(acc, dx)
        d = s_c - _shift_rows(s_c, dx)
        out = out + _align_window_packed(a, d, acc, P, G)
    out_ref[0] = out[out_off:].astype(out_ref.dtype)


# A/B toggle: derive the box kernel's alignment deltas in-kernel from s
# rows instead of a precomputed (H, 8P, W) delta array. Measured +1.6%
# on the hier16 headline (benchmarks/hier_ab_r3e.py: 179.6 vs 176.7
# Mpx/s) — kills ~236 MB/pack of i32 delta traffic plus its XLA
# construction passes. Default on; the d_ref path stays exactness-pinned
# (tests/test_banded_pallas.py::TestBoxInKernelDeltas).
_BOX_INKERNEL_DELTAS = True


@functools.partial(
    jax.jit,
    static_argnames=(
        "band", "granularity", "block_size", "out_off", "seam", "interpret"
    ),
)
def aligned_box_packed(
    pix, s, band: int, granularity: int, block_size: int = 5,
    out_off: int = 0, seam=None, interpret: bool = False,
):
    """Pallas aligned 5x5 box over the packed banded pixel cost.

    pix: (H, W, 128) int16; s: (P, H, W) int32 on the SAME columns as
    pix. Returns (H, W - out_off, 128) i16 — out_off trims the emitted
    row to the aggregation's valid region in-kernel (out_off % 8 == 0),
    replacing the XLA slice pass over the full cost volume.
    (An XLA shift+select formulation measured 11 ms/frame at 720p — the
    lane-padded packed delta maps blow up to ~40 GB of materialized
    intermediates; in-kernel the deltas are (W, 8P) rows.)

    seam: optional (top, Hc, Hseg) for hier's seam-stacked layout: row
    index maps then clamp WITHIN each segment's real-row range
    [seg*Hseg + top, seg*Hseg + top + Hc - 1] instead of [0, H-1] —
    cv2's replicate border rule clamps the COST rows, so each stacked
    segment must clamp to its own frame's rows (an image-content
    replica pad row is NOT the edge cost row: its sobel never sees the
    inward neighbor). Pad-row outputs read real rows and are garbage by
    construction (row-local downstream never mixes them in).
    """
    H, W = pix.shape[0], pix.shape[1]
    P = s.shape[0]
    K = band
    assert P * K == 128 and block_size == 5, "kernel is specialized to bs=5"
    assert out_off >= 0 and out_off % 8 == 0
    G = granularity
    Wo = W - out_off

    if seam is None:
        clamp_row = lambda y, dy: jnp.clip(y + dy, 0, H - 1)
    else:
        top, Hc, Hseg = seam
        assert H % Hseg == 0

        def clamp_row(y, dy):
            lo = (y // Hseg) * Hseg + top
            return jnp.clip(y + dy, lo, lo + Hc - 1)

    def spec_dy(dy):
        return pl.BlockSpec(
            (1, W, 128),
            lambda y, dy=dy: (clamp_row(y, dy), 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec((1, Wo, 128), lambda y: (y, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H, Wo, 128), jnp.int16)

    if _BOX_INKERNEL_DELTAS:
        s_t = jnp.moveaxis(s, 0, 1).astype(jnp.int32)  # (H, P, W)

        def spec_s(dy):
            return pl.BlockSpec(
                (1, P, W),
                lambda y, dy=dy: (clamp_row(y, dy), 0, 0),
                memory_space=pltpu.VMEM,
            )

        kern = functools.partial(
            _aligned_box_kernel_srows, P, K, G, block_size, H, W, out_off
        )
        return pl.pallas_call(
            kern,
            grid=(H,),
            in_specs=[spec_dy(d) for d in (-2, -1, 0, 1, 2)]
            + [spec_s(d) for d in (-2, -1, 0, 1, 2)],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
        )(pix, pix, pix, pix, pix, s_t, s_t, s_t, s_t, s_t)

    assert seam is None, "seam-stacked layout requires _BOX_INKERNEL_DELTAS"
    se = jnp.pad(s, ((0, 0), (2, 2), (0, 0)), mode="edge")
    sxe = jnp.pad(s, ((0, 0), (0, 0), (2, 2)), mode="edge")
    deltas = [s - se[:, 2 + dy : 2 + dy + H] for dy in (-2, -1, 1, 2)]
    deltas += [s - sxe[:, :, 2 + dx : 2 + dx + W] for dx in (-2, -1, 1, 2)]
    d_all = jnp.concatenate(
        [jnp.moveaxis(d, 0, 1).astype(jnp.int32) for d in deltas], axis=1
    )  # (H, 8P, W) — P on sublanes (see _pack_mm)

    specD = pl.BlockSpec((1, 8 * P, W), lambda y: (y, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_aligned_box_kernel, P, K, G, block_size, H, W, out_off)
    return pl.pallas_call(
        kern,
        grid=(H,),
        in_specs=[spec_dy(d) for d in (-2, -1, 0, 1, 2)] + [specD],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(pix, pix, pix, pix, pix, d_all)


# ---------------------------------------------------------------------------
# aggregation kernels
# ---------------------------------------------------------------------------


def _vert_kernel(P, K, G, P1, P2, with_diag, mid_realign, *refs):
    """Grid step r: 8 down rows (8r..8r+7) + the mirrored 8 up rows.

    Tile-aligned batching: the shift map is constant on 8-row tiles
    aligned to the block grid (``mid_realign`` False), so the VERTICAL
    carry needs re-alignment only at block entry (row 8r vs 8r-1) — 7
    of 8 updates are plain. With 4-row tiles (hier tile*f == 4, e.g.
    HIER_FAST) ``mid_realign`` adds ONE more aligned update at the
    mid-block boundary (row 8r+4 vs 8r+3). Diagonal carries cross
    COLUMN tiles every row and keep per-row alignment (the 8-path
    premium).

    L scratch: (6, W, 128) — [0] dn-vert [1] dn-diag+1 [2] dn-diag-1,
    [3..5] the up set. de_ref: (1, 2P, W) block-entry vertical deltas
    [dn, up] (or (1, 4P, W) [dn-entry, dn-mid, up-entry, up-mid] when
    mid_realign); ddn_ref/dup_ref: (8, 2P, W) per-row diagonal deltas
    [towards +x, towards -x] (up arrays pre-flipped; present only when
    with_diag — their lane-padded blocks cost ~19 MB VMEM otherwise).
    """
    if with_diag:
        c_dn_ref, c_up_ref, de_ref, ddn_ref, dup_ref, s_dn_ref, s_up_ref, L_ref = refs
    else:
        c_dn_ref, c_up_ref, de_ref, s_dn_ref, s_up_ref, L_ref = refs
        ddn_ref = dup_ref = None
    r = pl.program_id(0)
    W = s_dn_ref.shape[1]
    first_blk = r == 0
    n_slots = 2 if mid_realign else 1

    for up in (False, True):
        c_blk = (c_up_ref if up else c_dn_ref)
        base = 3 if up else 0
        out_ref = s_up_ref if up else s_dn_ref
        slot = (1 if up else 0) * n_slots
        dv = _pack_mm(de_ref[0, slot * P : (slot + 1) * P, :], P)
        dv_mid = (
            _pack_mm(de_ref[0, (slot + 1) * P : (slot + 2) * P, :], P)
            if mid_realign else None
        )
        d_diag = dup_ref if up else ddn_ref

        for j in range(8):
            row = 7 - j if up else j
            c = c_blk[row].astype(jnp.float32)

            if j == 0:
                @pl.when(first_blk)
                def _init(c=c, base=base, out_ref=out_ref, row=row):
                    for k in range(3 if with_diag else 1):
                        L_ref[base + k] = c
                    out_ref[row] = (c * (3 if with_diag else 1)).astype(out_ref.dtype)

            def _step(c=c, dv=dv, dv_mid=dv_mid, base=base, out_ref=out_ref, row=row, j=j, d_diag=d_diag, up=up):
                if j == 0:
                    Lv = _update_packed(
                        c, _align_packed(L_ref[base], dv, P, K, G), P, K, P1, P2
                    )
                elif mid_realign and j == 4:
                    Lv = _update_packed(
                        c, _align_packed(L_ref[base], dv_mid, P, K, G), P, K, P1, P2
                    )
                else:
                    Lv = _update_packed(c, L_ref[base], P, K, P1, P2, may_miss=False)
                L_ref[base] = Lv
                if with_diag:
                    dd = _pack_mm(d_diag[j, 0:P, :], P)
                    du = _pack_mm(d_diag[j, P : 2 * P, :], P)
                    # column shifts (sublane axis), zero-fill border
                    zrow = jnp.zeros((1, 128), jnp.float32)
                    Ldp = jnp.concatenate([zrow, L_ref[base + 1][:-1]], axis=0)
                    Lup = jnp.concatenate([L_ref[base + 2][1:], zrow], axis=0)
                    Ld = _update_packed(
                        c, _align_packed(Ldp, dd, P, K, G, diag=True), P, K, P1, P2
                    )
                    Lu = _update_packed(
                        c, _align_packed(Lup, du, P, K, G, diag=True), P, K, P1, P2
                    )
                    L_ref[base + 1] = Ld
                    L_ref[base + 2] = Lu
                    out = Lv + Ld + Lu
                else:
                    out = Lv
                out_ref[row] = out.astype(out_ref.dtype)

            if j == 0:
                pl.when(jnp.logical_not(first_blk))(_step)
            else:
                _step()


_BW = 8


def _horiz_kernel(P, K, G, P1, P2, reverse, mid_realign, c_ref, dh_ref, s_ref, L_ref):
    """One horizontal direction over column blocks of _BW (cf.
    sgm_pallas._horizontal_kernel).

    Tile-aligned batching: shift-map column tiles are _BW-wide and
    aligned to the block grid, so the carry re-aligns only at BLOCK
    entry (dh_ref: (1, P, H) entry delta per block — (1, 2P, H)
    [entry, mid] with ``mid_realign`` for 4-px tiles); the remaining
    column updates are plain.
    """
    b0 = pl.program_id(0)
    first_blk = b0 == 0
    dh = _pack_mm(dh_ref[0, :P], P)
    dh_mid = _pack_mm(dh_ref[0, P : 2 * P], P) if mid_realign else None

    for j in range(_BW):
        col = _BW - 1 - j if reverse else j
        c = c_ref[:, col].astype(jnp.float32)

        if j == 0:
            @pl.when(first_blk)
            def _init(c=c, col=col):
                L_ref[:] = c
                s_ref[:, col] = c.astype(s_ref.dtype)

        def _step(c=c, col=col, j=j):
            if j == 0:
                L2 = _update_packed(
                    c, _align_packed(L_ref[:], dh, P, K, G), P, K, P1, P2
                )
            elif mid_realign and j == 4:
                L2 = _update_packed(
                    c, _align_packed(L_ref[:], dh_mid, P, K, G), P, K, P1, P2
                )
            else:
                L2 = _update_packed(c, L_ref[:], P, K, P1, P2, may_miss=False)
            L_ref[:] = L2
            s_ref[:, col] = L2.astype(s_ref.dtype)

        if j == 0:
            pl.when(jnp.logical_not(first_blk))(_step)
        else:
            _step()


# ---------------------------------------------------------------------------
# WTA kernel (packed, segmented)
# ---------------------------------------------------------------------------


# A/B toggle (default OFF — measured slower; see the vol_dtype note in
# banded_reduce_pack): store the direction volumes int16 when the cost
# bound fits. Exactness pinned by TestVolInt16 in tests/test_banded_pallas.py.
_VOL_INT16 = False


def _wta_kernel(P, K, uniq, sub, *refs):
    """Stats from the in-kernel sum of the 2-4 direction volumes.

    Output block (R, W, 32): lane j = P*stat + b, stats
    [minS, best, sm, s0, sp, uok]; P <= 4 packs at most 24 used lanes.
    With ``sub`` the subpixel parabola finishes IN-KERNEL on the
    group-replicated samples (which are computed here anyway) and the
    stats shrink to [minS, best, sub16, uok] — the caller's XLA subpixel
    pass (whose int32 division alone was 0.48 ms/pack, r3n trace) and a
    third of the unpack traffic disappear. sub16 is band-relative in
    LANE units x16, exactly sgbm.subpixel_disp16(best, sm, s0, sp, K):
    the C division by 2*denom2 has quotient magnitude <= 8 (|sm - sp| <=
    denom2 since s0 is the min), so 8 compare-accumulates on |num| give
    it exactly; all operands are integers < 2^24, exact in f32.

    All lane concats/slices run on 2-D (W, 128) values — Mosaic's vector
    layout pass aborts on lane slices of 3-D values (the proven sgm
    kernels only ever lane-op 2-D blocks) — so blocks are single rows.

    The subpixel samples and the uniqueness verdict use MXU group-sums
    (one-hot masked S @ the group matrix A[l, l'] = (l % P == l' % P))
    instead of rotation butterflies: the mask picks exactly one lane per
    group so the sum IS the sample. S values exceed bf16's 8-bit mantissa,
    so those matmuls run at HIGHEST precision (exact f32 3-pass).
    """
    *in_refs, out_ref = refs
    _, W, _ = in_refs[0].shape
    S = in_refs[0][0].astype(jnp.float32)
    for r in in_refs[1:]:
        S = S + r[0].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    rowl = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lanel = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    A = (rowl % P == lanel % P).astype(jnp.float32)
    gsum = lambda m: jax.lax.dot(m, A, precision=jax.lax.Precision.HIGHEST)

    ds = (lane // P).astype(jnp.float32)
    minS = _rot_min(S, P, K)
    best = _rot_min(jnp.where(S == minS, ds, float(K)), P, K)
    if uniq > 0:
        offend = ((minS * (100.0 + uniq) > S * 100.0) & (jnp.abs(ds - best) > 1.0)).astype(jnp.float32)
        # offend is 0/1 (bf16-exact) — the default-precision group-sum
        # counts offenders per frame.
        uok = (jax.lax.dot(offend, A) < 0.5).astype(jnp.float32)
    else:
        uok = jnp.ones_like(minS)
    d0 = jnp.clip(best, 1.0, float(K - 2))
    sel = lambda tgt: gsum(jnp.where(ds == tgt, S, 0.0))
    sm, s0v, sp = sel(d0 - 1.0), sel(d0), sel(d0 + 1.0)
    if sub:
        denom2 = jnp.maximum(sm + sp - 2.0 * s0v, 1.0)
        den = 2.0 * denom2
        anum = jnp.abs((sm - sp) * 16.0 + denom2)
        qa = jnp.zeros_like(anum)
        for c in range(1, 9):
            qa = qa + (anum >= float(c) * den).astype(jnp.float32)
        q = jnp.where((sm - sp) * 16.0 + denom2 < 0.0, -qa, qa)
        sub16 = jnp.where(
            (best > 0.0) & (best < float(K - 1)), best * 16.0 + q, best * 16.0
        )
        stats = [minS, best, sub16, uok]
    else:
        stats = [minS, best, sm, s0v, sp, uok]
    # lane j = P*stat_idx + b reads stat's replicated value at k = stat_idx
    # (the value is replicated across the group, so no lane movement is
    # needed — only selects). Full-width output: Mosaic aborts on ANY
    # 32-lane value (strided lane slices), so the caller slices in XLA.
    out = jnp.zeros((W, 128), jnp.float32)
    for idx, st in enumerate(stats):
        out = jnp.where(lane // P == idx, st, out)
    out_ref[0] = out


def _wta_fused_kernel(P, K, uniq, *refs):
    """Fused WTA + subpixel + LR-input packing, 8 rows per grid step.

    Emits ONE dense int32 (1, W, 128) block per 8 input rows, lane
    j = (2*r + stat)*P + b for row-in-block r, frame b:
      stat 0: pack   = minS*2048 + best_abs  (lr_fail_pallas projection
              input, mindisp == 0)
      stat 1: du     = disp16 + 32768*unique_ok
    replacing the 6-stat 48-of-128-lane f32 volume plus the XLA
    subpixel / pack-build / floor-ceil passes (round 3m,
    docs/sgbm_roofline.md). Requires K == 16: the 8 rows x 2 stats fill
    the 16 lane groups exactly, and the group-replicated stat values can
    be placed by pure lane selects (no lane movement), the same trick as
    the 6-stat output.

    cv2's subpixel C-division (sgbm.subpixel_disp16 semantics)
    is computed EXACTLY without integer division: the quotient of
    ((sm - sp)*16 + denom2) by 2*denom2 lies in [-8, 8] (num is within
    [-15, 17]*denom2), so 8 compare-accumulates on |num| give
    floor(|num|/den) == trunc, and the sign is re-applied with a select.
    All f32 arithmetic here is exact: every operand is an integer below
    2^24. best_abs needs the shift map: s arrives as a (8, W, P) block
    and is broadcast to each frame's lanes by one 0/1 MXU matmul
    (s <= 2047 exceeds bf16's integer range past 256, so HIGHEST).
    """
    *in_refs, s_ref, out_ref = refs
    _, W, _ = in_refs[0].shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    rowl = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lanel = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    A = (rowl % P == lanel % P).astype(jnp.float32)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    lanep = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    M = (lanep % P == rowp).astype(jnp.float32)
    gsum = lambda m: jax.lax.dot(m, A, precision=jax.lax.Precision.HIGHEST)
    ds = (lane // P).astype(jnp.float32)
    slot = lane // P

    out = jnp.zeros((W, 128), jnp.int32)
    for r in range(8):
        S = in_refs[0][r].astype(jnp.float32)
        for ref in in_refs[1:]:
            S = S + ref[r].astype(jnp.float32)
        minS = _rot_min(S, P, K)
        best = _rot_min(jnp.where(S == minS, ds, float(K)), P, K)
        if uniq > 0:
            offend = (
                (minS * (100.0 + uniq) > S * 100.0) & (jnp.abs(ds - best) > 1.0)
            ).astype(jnp.float32)
            uok_i = (jax.lax.dot(offend, A) < 0.5).astype(jnp.int32)
        else:
            uok_i = jnp.ones((W, 128), jnp.int32)
        d0 = jnp.clip(best, 1.0, float(K - 2))
        sel = lambda tgt: gsum(jnp.where(ds == tgt, S, 0.0))
        sm, s0v, sp = sel(d0 - 1.0), sel(d0), sel(d0 + 1.0)
        denom2 = jnp.maximum(sm + sp - 2.0 * s0v, 1.0)
        den = 2.0 * denom2
        num = (sm - sp) * 16.0 + denom2
        anum = jnp.abs(num)
        qa = jnp.zeros_like(anum)
        for c in range(1, 9):
            qa = qa + (anum >= float(c) * den).astype(jnp.float32)
        q = jnp.where(num < 0.0, -qa, qa)
        sub16 = jnp.where(
            (best > 0.0) & (best < float(K - 1)), best * 16.0 + q, best * 16.0
        )
        s_l = jax.lax.dot(
            s_ref[r].astype(jnp.float32), M,
            precision=jax.lax.Precision.HIGHEST,
        )  # (W, 128): frame b's shift replicated on its lanes
        pack = minS.astype(jnp.int32) * 2048 + (best + s_l).astype(jnp.int32)
        du = (sub16 + 16.0 * s_l).astype(jnp.int32) + uok_i * 32768
        out = jnp.where(slot == 2 * r, pack, out)
        out = jnp.where(slot == 2 * r + 1, du, out)
    out_ref[0] = out


# ---------------------------------------------------------------------------
# assembled packed reduce (aggregation + WTA)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "band", "granularity", "P1", "P2", "uniq", "num_paths", "tile_px",
        "cost_bound", "fused_out", "sub_out", "interpret",
    ),
)
def banded_reduce_pack(
    C: jnp.ndarray,
    s: jnp.ndarray,
    band: int,
    granularity: int,
    P1: int,
    P2: int,
    uniq: int,
    num_paths: int = 8,
    tile_px: int = 8,
    cost_bound: int = 93 * 121,
    fused_out: bool = False,
    sub_out: bool = False,
    interpret: bool = False,
):
    """Packed banded aggregation + WTA.

    Args:
      C: (H, W, 128) packed banded windowed cost (int16/int32).
      s: (P, H, W) int32 shift maps (the same region as C's columns).
      tile_px: the shift map's square tile side, aligned to this
        region's origin. 8 (or any multiple of 8): carries re-align at
        block boundaries only. 4: one extra mid-block realignment per
        direction (hier tile*coarse_factor == 4, e.g. HIER_FAST).

    Returns six (P, H, W) float32 stat maps:
      (minS, best_k, sm, s0, sp, unique_ok) — or, with ``sub_out``, FOUR
    maps (minS, best_k, sub16, unique_ok) with the subpixel parabola
    finished in the WTA kernel (see _wta_kernel) — or, with ``fused_out``
    (requires band == 16, P == 8), TWO (P, H, W) int32 maps
    (pack, disp16 + 32768*unique_ok) from the fused WTA kernel
    (see _wta_fused_kernel; consumed by hier._assemble_fused).
    """
    H, W0, _ = C.shape
    P = s.shape[0]
    K = band
    assert P * K == 128
    assert tile_px == 4 or tile_px % 8 == 0, f"unsupported tile_px {tile_px}"
    mid_realign = tile_px == 4
    G = granularity
    with_diag = num_paths >= 8

    W = ((W0 + _BW - 1) // _BW) * _BW
    Hp = ((H + 7) // 8) * 8
    cf = C if C.dtype == jnp.int16 else C.astype(jnp.float32)

    # Direction-volume dtype: every stored L is bounded by
    # window_cost_max + max(P1, P2) (the (min,+) update never exceeds
    # minL + P2 above the new cost; pixel BT cost <= 2*ftzero + 63 <= 93),
    # times 3 for the summed diag set. When that bound fits int16, the
    # volumes CAN be stored int16 — the f32->int16 pack sits in the
    # STORE, outside the carry-chain dataflow — halving ~1.9 GB/pack of
    # HBM volume traffic (write + WTA read). MEASURED REJECTED on the
    # chip (2026-08-18, full bench A/B): hier16 173.8 -> 163.6 Mpx/s,
    # hier4 ~75 -> 67.9. Dataflow-independence is not issue-independence:
    # the pack op still occupies the VPU issue pipe inside the per-
    # column/per-row sequential loops, and these kernels are issue-bound
    # (r2 rule), while the WTA read they would cheapen is only partially
    # bandwidth-bound post-banding. Exactness-tested capability kept
    # behind _VOL_INT16 for a future toolchain with cheaper packs.
    vol_bound = (3 if with_diag else 1) * (cost_bound + max(P1, P2))
    vol_dtype = jnp.int16 if (_VOL_INT16 and vol_bound < 32767) else jnp.float32
    if W != W0 or Hp != H:
        # Zero-cost pad rows/cols with edge-extended s: zero cost + zero
        # delta carries the border rule through the pad (sgm_pallas
        # reasoning) and keeps the 8-aligned tile grid intact.
        cf = jnp.pad(cf, ((0, Hp - H), (0, W - W0), (0, 0)))
        s = jnp.pad(s, ((0, 0), (0, Hp - H), (0, W - W0)), mode="edge")

    # Tile-aligned batching (the kernels re-align carries only at 8-row /
    # 8-column block boundaries): requires the shift map constant on
    # 8x8 tiles aligned to this region's origin — guaranteed by
    # hier.shift_map (tile = coarse_factor*tile = 8) plus min_x % 8 == 0.
    def hpw(a):  # (P, h, w) -> (h, P, w) int32, P on sublanes
        return jnp.moveaxis(a, 0, 1).astype(jnp.int32)

    nR = Hp // 8
    sf = jnp.flip(s, 1)

    def entry_deltas(sp):  # (P, Hp, W) -> (nR, P, W): s(8r) - s(8r-1)
        d = sp[:, 8::8] - sp[:, 7:-1:8]
        z = jnp.zeros_like(sp[:, :1])
        return hpw(jnp.concatenate([z, d], axis=1))

    def mid_deltas(sp):  # (nR, P, W): s(8r+4) - s(8r+3)
        return hpw(sp[:, 4::8] - sp[:, 3::8])

    if mid_realign:
        de = jnp.concatenate(
            [entry_deltas(s), mid_deltas(s), entry_deltas(sf), mid_deltas(sf)],
            axis=1,
        )
    else:
        de = jnp.concatenate([entry_deltas(s), entry_deltas(sf)], axis=1)
    de_slots = 4 if mid_realign else 2

    def diag_deltas(sp):  # per-row diagonal deltas (Hp, 2P, W)
        z = jnp.zeros_like(sp[:, :1])
        prev = sp[:, :-1]
        pd = jnp.concatenate([sp[:, 1:, :1], prev[:, :, :-1]], axis=2)
        dd = jnp.concatenate([z, sp[:, 1:] - pd], axis=1)
        pu = jnp.concatenate([prev[:, :, 1:], sp[:, 1:, -1:]], axis=2)
        du = jnp.concatenate([z, sp[:, 1:] - pu], axis=1)
        return jnp.concatenate([hpw(dd), hpw(du)], axis=1)

    specC_dn = pl.BlockSpec((8, W, 128), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    specC_up = pl.BlockSpec((8, W, 128), lambda r: (nR - 1 - r, 0, 0), memory_space=pltpu.VMEM)
    specDE = pl.BlockSpec((1, de_slots * P, W), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    specDG = pl.BlockSpec((8, 2 * P, W), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)

    args = (cf, cf, de)
    in_specs = [specC_dn, specC_up, specDE]
    if with_diag:
        args = args + (diag_deltas(s), diag_deltas(sf))
        in_specs += [specDG, specDG]

    vert = pl.pallas_call(
        functools.partial(
            _vert_kernel, P, K, G, float(P1), float(P2), with_diag, mid_realign
        ),
        grid=(nR,),
        in_specs=in_specs,
        out_specs=[specC_dn, specC_up],
        out_shape=[jax.ShapeDtypeStruct((Hp, W, 128), vol_dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((6, W, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )
    s_dn, s_up = vert(*args)

    # Horizontal: block-entry column deltas per direction.
    nB = W // _BW

    def col_entry(sp):  # (P, Hp, W) -> (nB, P, Hp): s(8b) - s(8b-1)
        d = sp[:, :, 8::8] - sp[:, :, 7:-1:8]
        z = jnp.zeros_like(sp[:, :, :1])
        return jnp.transpose(
            jnp.concatenate([z, d], axis=2), (2, 0, 1)
        ).astype(jnp.int32)

    def col_mid(sp, reverse):  # (nB, P, Hp): mid-block column delta
        # L->R enters column 8b+4 from 8b+3; R->L enters 8b+3 from 8b+4.
        d = sp[:, :, 4::8] - sp[:, :, 3::8]
        if reverse:
            d = -d
        return jnp.transpose(d, (2, 0, 1)).astype(jnp.int32)

    dh_lr = col_entry(s)
    # R->L: block nB-1-b entered at its rightmost column 8B+7 with
    # predecessor 8B+8 (zero at the rightmost block).
    d_rl = s[:, :, 7:-1:8] - s[:, :, 8::8]
    dh_rl = jnp.transpose(
        jnp.concatenate([d_rl, jnp.zeros_like(s[:, :, :1])], axis=2),
        (2, 0, 1),
    ).astype(jnp.int32)
    if mid_realign:
        dh_lr = jnp.concatenate([dh_lr, col_mid(s, False)], axis=1)
        dh_rl = jnp.concatenate([dh_rl, col_mid(s, True)], axis=1)
    dh_rows = (2 if mid_realign else 1) * P

    def horiz(reverse):
        if reverse:
            imapC = lambda b: (0, nB - 1 - b, 0)
            imapD = lambda b: (nB - 1 - b, 0, 0)
        else:
            imapC = lambda b: (0, b, 0)
            imapD = lambda b: (b, 0, 0)
        return pl.pallas_call(
            functools.partial(
                _horiz_kernel, P, K, G, float(P1), float(P2), reverse, mid_realign
            ),
            grid=(nB,),
            in_specs=[
                pl.BlockSpec((Hp, _BW, 128), imapC, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh_rows, Hp), imapD, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Hp, _BW, 128), imapC, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, W, 128), vol_dtype),
            scratch_shapes=[pltpu.VMEM((Hp, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                # Height-scaled cap (the sgm_pallas._horiz_vmem_limit
                # pattern): blocks are full-height (Hp, 8, 128) columns,
                # double-buffered in (i16/f32) + out (vol_dtype) + delta
                # rows + the (Hp, 128) carry scratch. The old fixed 48 MB
                # OOM'd at the D=256 seam-stacked coarse (nseg=16 ->
                # Hp=3072: "scoped allocation 56.05M ... limit 51.52M").
                vmem_limit_bytes=min(
                    100 * 1024 * 1024,
                    max(
                        48 * 1024 * 1024,
                        int(
                            (
                                2 * Hp * _BW * 128
                                * (cf.dtype.itemsize + jnp.dtype(vol_dtype).itemsize)
                                + Hp * 128 * 4
                            ) * 2.0
                        ) + 2 * 1024 * 1024,
                    ),
                )
            ),
            interpret=interpret,
        )(cf, dh_rl if reverse else dh_lr)

    # Path count: 2 = vertical pair only, 3 = + L->R, 4+ = both
    # horizontals (8 folds the diag set into the vertical kernel). The
    # banded prior already carries the global structure, so the cheap
    # modes lose far less than they would in full-range SGM (measured
    # agreement per scene: benchmarks/paths2_agreement.py).
    vols = [s_dn, s_up]
    if num_paths >= 3:
        vols.append(horiz(False))
    if num_paths >= 4:
        vols.append(horiz(True))

    if fused_out:
        # Fused WTA path: 8 rows per grid step over the PADDED (Hp) rows
        # (the pad rows' garbage stats are sliced away after unpack), one
        # dense int32 output block per step. See _wta_fused_kernel.
        assert K == 16 and P == 8, "fused WTA output requires band 16"
        sT = jnp.transpose(s, (1, 2, 0))  # (Hp, W, P): row-block x P
        spec_v = pl.BlockSpec((8, W, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        spec_s = pl.BlockSpec((8, W, P), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((1, W, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        # Width-scaled scoped-VMEM cap: double-buffered (8, W, 128)
        # blocks per direction volume + ~18 (W, 128) f32 temporaries.
        blocks = 2 * (len(vols) * 8 * 128 + 8 * P + 128) * W * 4
        want = int((blocks + 18 * W * 128 * 4) * 1.5)
        out = pl.pallas_call(
            functools.partial(_wta_fused_kernel, P, K, float(uniq)),
            grid=(Hp // 8,),
            in_specs=[spec_v] * len(vols) + [spec_s],
            out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((Hp // 8, W, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(110 * 1024 * 1024, max(48 * 1024 * 1024, want))
            ),
            interpret=interpret,
        )(*vols, sT)
        # lane j = (2r + stat)*P + b -> (stat, frame, row, x), ONE pass.
        u = out[:, :W0].reshape(Hp // 8, W0, 8, 2, P)
        u = jnp.transpose(u, (3, 4, 0, 2, 1)).reshape(2, P, Hp, W0)
        return u[0, :, :H], u[1, :, :H]

    vols = [a[:H] for a in vols]

    n_stats = 4 if sub_out else 6
    spec_in = pl.BlockSpec((1, W, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, W, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_wta_kernel, P, K, float(uniq), sub_out),
        grid=(H,),
        in_specs=[spec_in] * len(vols),
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((H, W, 128), jnp.float32),
        # Width-scaled scoped-VMEM cap: 4 in + 1 out (1, W, 128) f32 rows
        # double-buffered + kernel temporaries — the 16 MB default OOMs
        # at 1080p (W=1792 needs 16.33M).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(64, max(24, 24 * W // 1280)) * 1024 * 1024
        ),
        interpret=interpret,
    )(*vols)
    # ONE contiguous lane slice + reshape, not 24 strided slices (each
    # strided slice re-reads the full 472 MB volume in XLA).
    packed = outs[:, :W0, : n_stats * P].reshape(H, W0, n_stats, P)
    stats = jnp.moveaxis(packed, (2, 3), (0, 1))  # (n_stats, P, H, W)
    return tuple(stats[i] for i in range(n_stats))


# ---------------------------------------------------------------------------
# XLA prep + full packed stats assembly
# ---------------------------------------------------------------------------


# A/B toggle: emit pix/box only on the valid region (x >= min_x - 8 /
# x >= min_x). Output-invariant by construction (the scan reference
# slices the cost volume to x >= min_x before aggregating); the off
# position keeps the full-width kernels + XLA slice for comparison.
_TRIM_VALID = True


def _half_extrema(a):
    """cv2 BT half-sample extrema along rows (cf. sgbm._bt_channel_cost)."""
    l_ = jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    r_ = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    vl = (a + l_) // 2
    vr = (a + r_) // 2
    vl = vl.at[..., 0].set(a[..., 0])
    vr = vr.at[..., -1].set(a[..., -1])
    return (
        jnp.minimum(jnp.minimum(vl, vr), a),
        jnp.maximum(jnp.maximum(vl, vr), a),
    )


def prep_left(a):
    """(P, H, W) int -> (value, u0, u1) rows for the left image."""
    u0, u1 = _half_extrema(a.astype(jnp.int32))
    return a.astype(jnp.int32), u0, u1


def prep_right(a, ndisp: int):
    """(P, H, W) int -> (P, H, W + ndisp + 1) replicate-padded right rows
    (left pad ndisp, right pad 1 — the kernel derives the BT half-extrema
    from this single padded row, matching cv2's edge rules)."""
    return jnp.concatenate(
        [jnp.repeat(a[:, :, :1], ndisp, axis=2), a, a[:, :, -1:]], axis=2
    ).astype(jnp.int32)


def banded_stats_pack(
    left: jnp.ndarray,
    right: jnp.ndarray,
    s: jnp.ndarray,
    params,
    band: int,
    granularity: int,
    min_x: int,
    stride: int = 1,
    tile_px: int = 8,
    fused: bool = False,
    sub: bool = False,
    s_reduce=None,
    seam=None,
    interpret: bool = False,
):
    """Packed banded core: P frames end-to-end through the Pallas
    kernels. Mirrors banded.banded_stats_scan per frame (bit-exact,
    tests/test_banded_pallas.py). ``seam`` (static (top, Hc, Hseg)) is
    forwarded to the box kernel's segment-local row clamping — see
    aligned_box_packed.

    Args:
      left, right: (P, H, W) int images; s: (P, H, W) int32 shift maps.
      s_reduce: optional shift-map override for the AGGREGATION stage
        only (pix/box keep ``s``). Used by hier's seam-stacked coarse:
        marker rows whose delta exceeds the supported +-G force the
        scan carries to the border-rule reset at segment seams, while
        the windowed cost must keep the real map so its replicate-pad
        row contributions stay exact.

    Returns six (P, H, W - min_x) int32/bool maps:
      (minS, best_k, sm, s0, sp, unique_ok) — or, with ``sub``, FOUR
    maps (minS, best_k, sub16, unique_ok) with the subpixel parabola
    finished in the WTA kernel (== banded_stats_scan(sub=True)) — or,
    with ``fused``, the TWO fused-WTA int32 maps (see banded_reduce_pack
    fused_out).
    """
    P, H, W = left.shape
    D = params.num_disparities

    # Valid-region trim: the aggregation consumes x >= min_x only, and
    # its box input needs pix exact down to min_x - 2 — emit pix from
    # x0 = min_x - 8 (8-aligned) and have the box kernel crop to min_x
    # in-kernel, eliminating the XLA slice pass over the cost volume
    # (~0.4 GB read+write per 720p pack).
    if _TRIM_VALID and min_x >= 8 and min_x % 8 == 0:
        x0, out_off = min_x - 8, 8
    else:
        x0, out_off = 0, 0

    s_ext = jnp.pad(s, ((0, 0), (0, 0), (1, 1)), mode="edge")
    pix = banded_pixel_cost_pack(
        left.astype(jnp.int32), right.astype(jnp.int32), s_ext,
        ndisp=D, band=band, granularity=granularity,
        ftzero=params.ftzero, stride=stride, x0=x0, interpret=interpret,
    )
    # int16: windowed cost < 15k; halves the volume's HBM traffic and the
    # scan kernels' block DMAs (f32 blocks OOM'd scoped VMEM at 720p).
    C = aligned_box_packed(
        pix, s[:, :, x0:], band, granularity, params.block_size,
        out_off=out_off, seam=seam, interpret=interpret,
    )

    Cv = C if x0 + out_off == min_x else C[:, min_x:, :]
    sv = (s if s_reduce is None else s_reduce)[:, :, min_x:]
    outs = banded_reduce_pack(
        Cv, sv, band, granularity, params.P1, params.P2,
        params.uniqueness_ratio, num_paths=params.num_paths,
        tile_px=tile_px, cost_bound=93 * params.block_size ** 2,
        fused_out=fused, sub_out=sub, interpret=interpret,
    )
    if fused:
        return outs
    c = lambda a: a.astype(jnp.int32)
    if sub:
        minS, best, sub16, uok = outs
        return c(minS), c(best), c(sub16), uok > 0.5
    minS, best, sm, s0, sp, uok = outs
    return c(minS), c(best), c(sm), c(s0), c(sp), uok > 0.5
