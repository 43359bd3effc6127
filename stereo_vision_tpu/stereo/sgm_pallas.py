"""Pallas TPU kernels for semi-global matching aggregation.

The 8-direction SGM scans are the sequential core of dense stereo
(SURVEY.md §7 hard part #1). The XLA ``lax.scan`` formulation pays
~50 µs/step of loop overhead (1872 steps at 720p — ~100 ms); these
kernels instead run the scans as Pallas grid iterations with the carry
volumes resident in VMEM scratch, the cost rows streamed HBM→VMEM by the
Pallas pipeline, and all arithmetic in float32 — every value is
an integer far below 2^24 (windowed BT cost <= ~4.7k, L <= cost_max +
P2, 8-sum <= ~45k), so f32 is exact, and f32 min/add vectorize on every
Mosaic build (int16 vector min does not legalize).

Two kernels cover all 8 directions:
- vertical: the three "down" directions and the three "up" directions in
  one pass (step r reads row r and row H-1-r, keeping both carry sets in
  scratch),
- horizontal: left->right and right->left in one pass over columns.

Both produce float32 partial sums; the caller adds them in int32.
Semantics are bit-identical to the lax.scan reference implementation
(tests/test_sgm_pallas.py asserts exact equality), which itself is
cv2.StereoSGBM MODE_HH parity (tests/test_stereo_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Fill value for out-of-range d±1 neighbors: far above any reachable L.
_FILL = 1.0e6


def _update(c, L, minL, P1, P2):
    """One SGM step on (..., D) float32 blocks (exact integer math).

    L' = c + min(L, L(d-1)+P1, L(d+1)+P1, minL+P2) - minL.
    """
    fill = jnp.full_like(L[..., :1], _FILL)
    Lm = jnp.concatenate([fill, L[..., :-1]], axis=-1)
    Lp = jnp.concatenate([L[..., 1:], fill], axis=-1)
    cand = jnp.minimum(jnp.minimum(L, minL + P2), jnp.minimum(Lm, Lp) + P1)
    return c + cand - minL


def _min_d(L):
    return jnp.min(L, axis=-1, keepdims=True)


def _shift_w(a, direction):
    """Shift a (W, D) block along W (sublanes); zero-fill (SGM border: the
    out-of-image predecessor contributes L=0, min=0 — matching the scan
    reference's zero-filled column shifts)."""
    z = jnp.zeros_like(a[:1])
    if direction > 0:
        return jnp.concatenate([z, a[:-1]], axis=0)
    return jnp.concatenate([a[1:], z], axis=0)


_VR = 2  # vertical rows per grid step. Near-neutral (20.06 vs 19.63
         # Mpx/s full-pipe at 720p/D=128): the scan is bound by the
         # row-to-row dependency chain, not step count; 2 keeps the small
         # edge and exercises the multi-row path.


def _vertical_kernel(P1, P2, with_diag, c_dn_ref, c_up_ref, s_dn_ref, s_up_ref, L_ref):
    """Grid step r: advance the down-direction carries with rows
    [_VR*r, _VR*r+_VR) and the up carries with the mirrored rows
    (processed high-to-low inside the block).

    L_ref scratch layout: (6, W, D) float32 —
      [0] down-vertical  [1] down-diag+1  [2] down-diag-1
      [3] up-vertical    [4] up-diag+1    [5] up-diag-1
    Diagonal carries are shifted one column per row, exactly like the scan
    reference (for the up set the reference scans the y-flipped volume
    with the SAME column-shift directions, so the shifts here match).
    """
    r = pl.program_id(0)

    for j in range(_VR):
        c_dn = c_dn_ref[j].astype(jnp.float32)
        c_up = c_up_ref[_VR - 1 - j].astype(jnp.float32)
        first = (r == 0) & (j == 0)

        @pl.when(first)
        def _init(c_dn=c_dn, c_up=c_up, j=j):
            # Zero carry + zero min => first-row L equals the cost row.
            for k, c in ((0, c_dn), (3, c_up)):
                L_ref[k] = c
                if with_diag:
                    L_ref[k + 1] = c
                    L_ref[k + 2] = c
            s_dn_ref[j] = (c_dn * (3 if with_diag else 1)).astype(s_dn_ref.dtype)
            s_up_ref[_VR - 1 - j] = (c_up * (3 if with_diag else 1)).astype(s_up_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _step(c_dn=c_dn, c_up=c_up, j=j):
            for k, c in ((0, c_dn), (3, c_up)):
                Lv = L_ref[k]
                Lv2 = _update(c, Lv, _min_d(Lv), P1, P2)
                L_ref[k] = Lv2
                if with_diag:
                    Ld = _shift_w(L_ref[k + 1], 1)
                    Lu = _shift_w(L_ref[k + 2], -1)
                    # Shifted-in zero columns carry (L=0, min=0) -> L' = c.
                    md = _shift_w(_min_d(L_ref[k + 1]), 1)
                    mu = _shift_w(_min_d(L_ref[k + 2]), -1)
                    Ld2 = _update(c, Ld, md, P1, P2)
                    Lu2 = _update(c, Lu, mu, P1, P2)
                    L_ref[k + 1] = Ld2
                    L_ref[k + 2] = Lu2
                    out = Lv2 + Ld2 + Lu2
                else:
                    out = Lv2
                if k == 0:
                    s_dn_ref[j] = out.astype(s_dn_ref.dtype)
                else:
                    s_up_ref[_VR - 1 - j] = out.astype(s_up_ref.dtype)


_BW = 8  # horizontal block width (TPU sublane granularity)


def _horiz_vmem_limit(H: int, D: int, in_itemsize: int, out_itemsize: int) -> int:
    """Scoped-VMEM cap for the horizontal scan kernels.

    Their blocks are full-height (H, _BW, D) columns, so the working set
    (double-buffered in + out blocks plus the (H, D) carry scratch) scales
    with H — at 1080p the compiler's 16 MB default OOMs ("scoped
    allocation 17.40M ... limit 16.00M"). Size the cap from the actual
    block bytes with 50% headroom, floored at the default and capped at
    100 MB (v5e VMEM is 128 MB)."""
    blocks = 2 * (H * _BW * D * in_itemsize + H * _BW * D * out_itemsize)
    scratch = H * D * 4
    want = int((blocks + scratch) * 1.5) + 2 * 1024 * 1024
    return min(100 * 1024 * 1024, max(16 * 1024 * 1024, want))


def _horizontal_kernel(P1, P2, reverse, c_ref, s_ref, L_ref):
    """Grid step b: advance one horizontal carry through the _BW columns of
    its block. ``reverse=False``: L->R over blocks 0..nB-1, columns 0.._BW-1;
    ``reverse=True``: R->L (the caller's index map feeds blocks right to
    left; columns are traversed in reverse inside the block).
    L_ref scratch: (H, D) float32. One direction per call — two directions
    in one kernel needs 4 double-buffered (H, _BW, D) blocks, which blows
    the 16 MB VMEM budget at 720p/D=128."""
    b = pl.program_id(0)

    for j in range(_BW):
        col = _BW - 1 - j if reverse else j
        c = c_ref[:, col].astype(jnp.float32)
        first = (b == 0) & (j == 0)

        @pl.when(first)
        def _init(c=c, col=col):
            L_ref[:] = c
            s_ref[:, col] = c.astype(s_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _step(c=c, col=col):
            L2 = _update(c, L_ref[:], _min_d(L_ref[:]), P1, P2)
            L_ref[:] = L2
            s_ref[:, col] = L2.astype(s_ref.dtype)


@functools.partial(jax.jit, static_argnames=("P1", "P2", "num_paths", "interpret"))
def aggregate_8_pallas(
    C: jnp.ndarray, P1: int, P2: int, num_paths: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """Full 8-direction aggregated cost volume via two Pallas kernels.

    Args:
      C: (H, W, D) int16/int32 windowed matching cost (values < ~5k).
      P1, P2: SGM penalties (static).

    Returns:
      (H, W, D) int32 sum over the 8 directional volumes.
    """
    H, W0, D = C.shape
    # Zero-pad W to the horizontal block width: zero-cost columns carry
    # (L=0, min=0), which is exactly the SGM border rule, so padding is
    # semantics-preserving for every direction (incl. diagonal shift-ins).
    W = ((W0 + _BW - 1) // _BW) * _BW
    # int16 input stays int16 through padding and the kernel block DMA
    # (halving HBM traffic for C); kernels cast to f32 after load.
    cf = C if C.dtype == jnp.int16 else C.astype(jnp.float32)
    if W != W0:
        cf = jnp.pad(cf, ((0, 0), (0, W - W0), (0, 0)))

    with_diag = num_paths >= 8
    # Pad H to the row-block size with zero-cost rows: a zero-cost row
    # leaves every carry at (L=0, min=0), exactly the border-init rule, so
    # the up-direction scan entering the real rows is unchanged.
    Hp = ((H + _VR - 1) // _VR) * _VR
    if Hp != H:
        cf = jnp.pad(cf, ((0, Hp - H), (0, 0), (0, 0)))
    nV = Hp // _VR
    vert = pl.pallas_call(
        functools.partial(_vertical_kernel, int(P1), int(P2), with_diag),
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((_VR, W, D), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_VR, W, D), lambda r: (nV - 1 - r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_VR, W, D), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_VR, W, D), lambda r: (nV - 1 - r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, W, D), jnp.float32),
            jax.ShapeDtypeStruct((Hp, W, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((6, W, D), jnp.float32)],
        # Width-scaled scoped-VMEM cap: the working set (double-buffered
        # in/out row blocks + the 6-carry full-width scratch) scales with
        # W; the 28 MB default OOMs the compile at 1080p (W=1792 needs
        # ~36 MB). v5e VMEM is 128 MB — cap at half so two kernels still
        # overlap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(64, max(28, 28 * W // 1408 + 8)) * 1024 * 1024
        ),
        interpret=interpret,
    )
    s_dn, s_up = vert(cf, cf)
    cf = cf[:H]
    s_dn = s_dn[:H]
    s_up = s_up[:H]

    nB = W // _BW

    def horiz_call(reverse: bool):
        if reverse:
            index_map = lambda b: (0, nB - 1 - b, 0)
        else:
            index_map = lambda b: (0, b, 0)
        return pl.pallas_call(
            functools.partial(_horizontal_kernel, int(P1), int(P2), reverse),
            grid=(nB,),
            in_specs=[pl.BlockSpec((H, _BW, D), index_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((H, _BW, D), index_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_horiz_vmem_limit(H, D, cf.dtype.itemsize, 4)
            ),
            interpret=interpret,
        )(cf)

    s_lr = horiz_call(False)
    s_rl = horiz_call(True)

    S = (
        s_dn.astype(jnp.int32)
        + s_up.astype(jnp.int32)
        + s_lr.astype(jnp.int32)
        + s_rl.astype(jnp.int32)
    )
    return S[:, :W0, :]


def _wta_kernel(uniq_ratio, c_ref, mins_ref, best_ref, sm_ref, s0_ref, sp_ref, uok_ref):
    """Reduce an (R, W, D) block of the aggregated volume to per-pixel
    stats in one pass: min cost, argmin (ties -> smallest d, like
    jnp.argmin), the S[d0-1], S[d0], S[d0+1] subpixel samples
    (d0 = clip(best, 1, D-2)) and the uniqueness verdict — so the
    postprocessing math runs on (H, W) maps instead of re-reading the
    volume several times."""
    S = c_ref[...]  # (R, W, D) float32
    R, W, D = S.shape
    minS = jnp.min(S, axis=-1, keepdims=True)
    # Mosaic iota must be integer-typed; widen to f32 for the comparisons.
    ds = jax.lax.broadcasted_iota(jnp.int32, (R, W, D), 2).astype(jnp.float32)
    best = jnp.min(jnp.where(S == minS, ds, jnp.float32(D)), axis=-1, keepdims=True)

    if uniq_ratio > 0:
        offend = (minS * (100.0 + uniq_ratio) > S * 100.0) & (jnp.abs(ds - best) > 1.0)
        uok = 1.0 - jnp.max(offend.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        uok = jnp.ones_like(minS)

    d0 = jnp.clip(best, 1.0, D - 2.0)
    sel = lambda tgt: jnp.sum(jnp.where(ds == tgt, S, 0.0), axis=-1, keepdims=True)
    mins_ref[...] = minS[..., 0]
    best_ref[...] = best[..., 0]
    sm_ref[...] = sel(d0 - 1.0)[..., 0]
    s0_ref[...] = sel(d0)[..., 0]
    sp_ref[...] = sel(d0 + 1.0)[..., 0]
    uok_ref[...] = uok[..., 0]


@functools.partial(jax.jit, static_argnames=("uniq_ratio", "rows", "cols", "interpret"))
def wta_stats_pallas(
    S: jnp.ndarray,
    uniq_ratio: int,
    rows: int = 8,
    cols: int = 128,
    interpret: bool = False,
):
    """(H, W, D) aggregated costs -> six (H, W) stat maps (see _wta_kernel).

    Values in S are < ~45k, exact in float32; outputs are float32 carrying
    exact integers (cast back by the caller). Blocks are (rows, cols, D) —
    rows=8 satisfies the output sublane constraint, cols=128 keeps the
    per-block intermediates inside the VMEM budget at D=128.
    """
    H, W, D = S.shape
    Hp = ((H + rows - 1) // rows) * rows
    Wp = ((W + cols - 1) // cols) * cols
    Sf = S.astype(jnp.float32)
    if (Hp, Wp) != (H, W):
        # Padded cells see an all-zero cost row: harmless (sliced away).
        Sf = jnp.pad(Sf, ((0, Hp - H), (0, Wp - W), (0, 0)))
    grid = (Hp // rows, Wp // cols)
    spec3 = pl.BlockSpec((rows, cols, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((rows, cols), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_wta_kernel, float(uniq_ratio)),
        grid=grid,
        in_specs=[spec3],
        out_specs=[spec2] * 6,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * 6,
        interpret=interpret,
    )(Sf)
    return tuple(o[:H, :W] for o in outs)


def _wta4_kernel(uniq_ratio, a_ref, b_ref, c_ref, d_ref,
                 mins_ref, best_ref, sm_ref, s0_ref, sp_ref, uok_ref):
    """WTA stats over the IN-KERNEL sum of the four direction volumes —
    the aggregated volume S is never materialized in HBM."""
    S = (
        a_ref[...].astype(jnp.float32)
        + b_ref[...].astype(jnp.float32)
        + c_ref[...].astype(jnp.float32)
        + d_ref[...].astype(jnp.float32)
    )
    R, W, D = S.shape
    minS = jnp.min(S, axis=-1, keepdims=True)
    ds = jax.lax.broadcasted_iota(jnp.int32, (R, W, D), 2).astype(jnp.float32)
    best = jnp.min(jnp.where(S == minS, ds, jnp.float32(D)), axis=-1, keepdims=True)
    if uniq_ratio > 0:
        offend = (minS * (100.0 + uniq_ratio) > S * 100.0) & (jnp.abs(ds - best) > 1.0)
        uok = 1.0 - jnp.max(offend.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        uok = jnp.ones_like(minS)
    d0 = jnp.clip(best, 1.0, D - 2.0)
    sel = lambda tgt: jnp.sum(jnp.where(ds == tgt, S, 0.0), axis=-1, keepdims=True)
    mins_ref[...] = minS[..., 0]
    best_ref[...] = best[..., 0]
    sm_ref[...] = sel(d0 - 1.0)[..., 0]
    s0_ref[...] = sel(d0)[..., 0]
    sp_ref[...] = sel(d0 + 1.0)[..., 0]
    uok_ref[...] = uok[..., 0]


def _horizontal_rl_wta_kernel(
    P1, P2, uniq_ratio,
    c_ref, vdn_ref, vup_ref, slr_ref,
    mins_ref, best_ref, sm_ref, s0_ref, sp_ref, uok_ref,
    L_ref,
):
    """R->L horizontal scan FUSED with the 4-input WTA: once this last
    direction's L is known for a column, the full aggregated cost
    S = L + s_dn + s_up + s_lr is complete there, so the per-pixel stats
    are computed in place and the fourth direction volume never exists in
    HBM (saves its 425 MB write + the WTA's re-read at 720p/D=128).

    Outputs are (nB, H, _BW) blocks — one stats tile per column block,
    transposed/reshaped to (H, W) by the caller (a 2-D (H, W) output with
    8-lane blocks violates the Mosaic lane-dim constraint; full-dim-8
    lane blocks don't).
    """
    b = pl.program_id(0)
    Hc, _, D = c_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hc, _BW), 1)
    z = jnp.zeros((Hc, _BW), jnp.float32)
    acc_min, acc_best, acc_sm, acc_s0, acc_sp, acc_uok = z, z, z, z, z, z
    ds = jax.lax.broadcasted_iota(jnp.int32, (Hc, D), 1).astype(jnp.float32)

    for j in range(_BW):
        col = _BW - 1 - j
        c = c_ref[:, col].astype(jnp.float32)
        first = (b == 0) & (j == 0)
        Lp = L_ref[:]
        # Value-level select instead of pl.when: on the first column the
        # scratch is garbage, but where() is a select, so the garbage
        # lane never escapes (costs one extra select on 1/1152 columns).
        L2 = jnp.where(first, c, _update(c, Lp, _min_d(Lp), P1, P2))
        L_ref[:] = L2

        S = (
            L2
            + vdn_ref[:, col].astype(jnp.float32)
            + vup_ref[:, col].astype(jnp.float32)
            + slr_ref[:, col].astype(jnp.float32)
        )
        minS = jnp.min(S, axis=-1, keepdims=True)
        best = jnp.min(jnp.where(S == minS, ds, jnp.float32(D)), axis=-1, keepdims=True)
        if uniq_ratio > 0:
            offend = (minS * (100.0 + uniq_ratio) > S * 100.0) & (jnp.abs(ds - best) > 1.0)
            uok = 1.0 - jnp.max(offend.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            uok = jnp.ones_like(minS)
        d0 = jnp.clip(best, 1.0, D - 2.0)
        sel = lambda tgt: jnp.sum(jnp.where(ds == tgt, S, 0.0), axis=-1, keepdims=True)

        hit = lane == col
        acc_min = jnp.where(hit, minS, acc_min)
        acc_best = jnp.where(hit, best, acc_best)
        acc_sm = jnp.where(hit, sel(d0 - 1.0), acc_sm)
        acc_s0 = jnp.where(hit, sel(d0), acc_s0)
        acc_sp = jnp.where(hit, sel(d0 + 1.0), acc_sp)
        acc_uok = jnp.where(hit, uok, acc_uok)

    mins_ref[0] = acc_min
    best_ref[0] = acc_best
    sm_ref[0] = acc_sm
    s0_ref[0] = acc_s0
    sp_ref[0] = acc_sp
    uok_ref[0] = acc_uok


# Fuse the R->L scan with the WTA (see _horizontal_rl_wta_kernel). Module
# flag for same-process A/B benchmarking; flip only with a measured win.
# A/B 2026-08-16 (720p/D=128, v5e, chained-jit, two rounds): baseline
# 19.69/19.45 ms vs fused 20.35/20.16 ms — the WTA's per-column compute
# lands inside the sequential column loop, where the scan is issue-bound,
# and costs more than the 850 MB of HBM traffic it saves (the separate
# WTA kernel overlaps its DMA with compute; the fused one serializes the
# stat math behind the carry chain). Exactness verified on-TPU either way
# (tests/test_sgm_pallas.py::test_fused_rl_wta_exact).
_FUSED_RL_WTA = False


@functools.partial(jax.jit, static_argnames=("P1", "P2", "uniq_ratio", "num_paths", "cost_bound", "interpret"))
def sgm_reduce_pallas(
    C: jnp.ndarray, P1: int, P2: int, uniq_ratio: int, num_paths: int = 8,
    cost_bound: int | None = None, interpret: bool = False,
):
    """Aggregation + WTA in one flow: the four direction partial volumes
    feed the fused WTA kernel directly (S never hits HBM as int32).

    cost_bound: static upper bound on the windowed cost values. When the
    3-direction set sum 3 * (cost_bound + P2) fits int16, the direction
    volumes are stored int16, halving their HBM writes + WTA reads.
    """
    assert num_paths >= 4, (
        "the exact Pallas reduce always runs both horizontal scans; "
        "2/3-path requests must use the scan backend (sgbm._aggregate_8) "
        "or the banded kernels (banded_pallas.banded_reduce_pack)"
    )
    H, W0, D = C.shape
    use_i16 = cost_bound is not None and 3 * (cost_bound + P2) < (1 << 15)
    vdt = jnp.int16 if use_i16 else jnp.float32
    W = ((W0 + _BW - 1) // _BW) * _BW
    # int16 input stays int16 through padding and the kernel block DMA
    # (halving HBM traffic for C); kernels cast to f32 after load.
    cf = C if C.dtype == jnp.int16 else C.astype(jnp.float32)
    if W != W0:
        cf = jnp.pad(cf, ((0, 0), (0, W - W0), (0, 0)))

    with_diag = num_paths >= 8
    # Pad H to the row-block size with zero-cost rows: a zero-cost row
    # leaves every carry at (L=0, min=0), exactly the border-init rule, so
    # the up-direction scan entering the real rows is unchanged.
    Hp = ((H + _VR - 1) // _VR) * _VR
    if Hp != H:
        cf = jnp.pad(cf, ((0, Hp - H), (0, 0), (0, 0)))
    nV = Hp // _VR
    vert = pl.pallas_call(
        functools.partial(_vertical_kernel, int(P1), int(P2), with_diag),
        grid=(nV,),
        in_specs=[
            pl.BlockSpec((_VR, W, D), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_VR, W, D), lambda r: (nV - 1 - r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_VR, W, D), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_VR, W, D), lambda r: (nV - 1 - r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Hp, W, D), vdt)] * 2,
        scratch_shapes=[pltpu.VMEM((6, W, D), jnp.float32)],
        # Width-scaled scoped-VMEM cap: the working set (double-buffered
        # in/out row blocks + the 6-carry full-width scratch) scales with
        # W; the 28 MB default OOMs the compile at 1080p (W=1792 needs
        # ~36 MB). v5e VMEM is 128 MB — cap at half so two kernels still
        # overlap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(64, max(28, 28 * W // 1408 + 8)) * 1024 * 1024
        ),
        interpret=interpret,
    )
    s_dn, s_up = vert(cf, cf)
    cf = cf[:H]
    s_dn = s_dn[:H]
    s_up = s_up[:H]

    nB = W // _BW

    def horiz_call(reverse: bool):
        if reverse:
            index_map = lambda b: (0, nB - 1 - b, 0)
        else:
            index_map = lambda b: (0, b, 0)
        return pl.pallas_call(
            functools.partial(_horizontal_kernel, int(P1), int(P2), reverse),
            grid=(nB,),
            in_specs=[pl.BlockSpec((H, _BW, D), index_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((H, _BW, D), index_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, D), vdt),
            scratch_shapes=[pltpu.VMEM((H, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_horiz_vmem_limit(
                    H, D, cf.dtype.itemsize, jnp.dtype(vdt).itemsize
                )
            ),
            interpret=interpret,
        )(cf)

    s_lr = horiz_call(False)

    if _FUSED_RL_WTA:
        # Stats blocks are (1, H8, _BW): the trailing dims need an
        # 8-multiple sublane count, so pad rows with zero cost (rows are
        # independent in horizontal scans; pad stats are sliced away).
        H8 = ((H + 7) // 8) * 8
        if H8 != H:
            padr = lambda a: jnp.pad(a, ((0, H8 - H), (0, 0), (0, 0)))
            cf, s_dn, s_up, s_lr = map(padr, (cf, s_dn, s_up, s_lr))
        rev_map3 = lambda b: (0, nB - 1 - b, 0)
        out_map = lambda b: (nB - 1 - b, 0, 0)
        spec_in = pl.BlockSpec((H8, _BW, D), rev_map3, memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, H8, _BW), out_map, memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(
                _horizontal_rl_wta_kernel, int(P1), int(P2), float(uniq_ratio)
            ),
            grid=(nB,),
            in_specs=[spec_in] * 4,
            out_specs=[spec_out] * 6,
            out_shape=[jax.ShapeDtypeStruct((nB, H8, _BW), jnp.float32)] * 6,
            scratch_shapes=[pltpu.VMEM((H8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=44 * 1024 * 1024),
            interpret=interpret,
        )(cf, s_dn, s_up, s_lr)
        # (nB, H8, _BW) -> (H, W) maps.
        return tuple(
            jnp.transpose(o, (1, 0, 2)).reshape(H8, W)[:H, :W0] for o in outs
        )

    s_rl = horiz_call(True)

    rows, cols = 8, 128
    Hp = ((H + rows - 1) // rows) * rows
    Wp = ((W + cols - 1) // cols) * cols
    if (Hp, Wp) != (H, W):
        padhw = lambda a: jnp.pad(a, ((0, Hp - H), (0, Wp - W), (0, 0)))
        s_dn, s_up, s_lr, s_rl = map(padhw, (s_dn, s_up, s_lr, s_rl))
    grid = (Hp // rows, Wp // cols)
    spec3 = pl.BlockSpec((rows, cols, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((rows, cols), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_wta4_kernel, float(uniq_ratio)),
        grid=grid,
        in_specs=[spec3] * 4,
        out_specs=[spec2] * 6,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * 6,
        interpret=interpret,
    )(s_dn, s_up, s_lr, s_rl)
    return tuple(o[:H, :W0] for o in outs)
