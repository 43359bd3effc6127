"""Fused Pallas LR-consistency check for SGBM.

The XLA formulation in stereo/sgbm.py runs two static-shift select chains
(D steps building the projected right disparity, D+2 steps looking it up
per left pixel). Each step is elementwise over an (H, W) map, so XLA
streams ~2 GB of intermediates through HBM — ~1.8 ms of the 720p/D=128
frame (device trace, docs/sgbm_roofline.md). This kernel runs both chains
in VMEM in one pass: the image is processed in 128-row lane blocks laid
out TRANSPOSED (x on sublanes, y on lanes), because Mosaic lowers
arbitrary-offset sublane value slices but not lane-offset slices — the
same layout rule as the cost kernel's shifted stacks (cost_pallas.py).

Semantics identical to the XLA section (cv2's packed disp2 projection +
floor/ceil lookup rule); tests assert exact mask equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = 1 << 30
_OOB = -(1 << 10)


def _lr_kernel(
    W, Wv, ndisp, mindisp, minX1, max_diff, *refs,
):
    """One 128-row lane block, transposed: refs are (sublanes=x, lanes=y).

    pack_ref: (W + maxD, 128) int32 full-frame-x packed (cost, winner)
    array (sentinel outside the valid region) — the winner rides the low
    11 bits, so no separate best array is shipped. df_ref/dc_ref:
    (Wv, 128) floor/ceil disparity per valid left pixel. fail_ref out:
    (Wv, 128) int32 1 where the cv2 LR rule invalidates the pixel.

    Three-ref form (the fused-WTA path): the middle ref is the 16x
    fixed-point disparity d16 (>= 0) instead of df/dc, and floor/ceil
    are derived in-kernel: floor(d16/16) == d16 >> 4 and
    ceil == (d16 + 15) >> 4 exactly for non-negative d16 — one fewer
    (Wv, H) transpose shipped through HBM.
    """
    if len(refs) == 3:
        pack_ref, d16_ref, fail_ref = refs
        df_ref = dc_ref = None
    else:
        pack_ref, df_ref, dc_ref, fail_ref = refs
    maxD = mindisp + ndisp
    pack = pack_ref[...]
    # Winner lane extracted from the pack's low bits (sentinel positions
    # extract 0, which can collide with d + mindisp == 0 — harmless: the
    # guarded value sl_p IS the sentinel there, a no-op under min).
    band = jnp.bitwise_and(pack, 2047)

    # disp2[x2] = min-cost packed value among left pixels x2 + d whose WTA
    # winner is exactly d (cv2's projection; min is lexicographic in
    # (cost, d) thanks to the *2048 packing).
    packed = jnp.full((W, 128), _SENTINEL, jnp.int32)
    for d in range(ndisp):
        off = d + mindisp
        sl_p = pack[off : off + W]
        sl_b = band[off : off + W]
        packed = jnp.minimum(packed, jnp.where(sl_b == off, sl_p, _SENTINEL))
    disp2 = jnp.where(
        packed >= _SENTINEL, jnp.int32(_OOB), jnp.bitwise_and(packed, 2047)
    )

    # Lookup disp2[x - dd] for dd = floor/ceil(disp): shifted selects over
    # the oob-padded row (out-of-range columns read _OOB and fail the
    # v >= mindisp test, like the XLA path).
    #
    # TWO-STAGE select (round 5, the pix-kernel trick): factor
    # d_f = 4q + r. The q-loop gathers FIVE consecutive-offset maps
    # U[t](x) = d2p[x + minX1 - 4q + t], t in [-4, 0], in ~D/4
    # iterations (one compare, the maps share one slice); both lookups
    # then resolve per pixel with static selects: v_f = U[-r] and
    # v_c = U[-(r + d_c - d_f)] (d_c - d_f in {0, 1}, and
    # r + 1 <= 4 so t = -4 covers the carry into the next q group).
    # ~36 iterations x 7 ops vs 130 x 5 of the direct loop; bit-exact
    # (mask-equality tests). q covers [-4, maxD&~3]: invalid pixels
    # carry d_f = -1 (r = 3, q = -4, int32 & is two's-complement).
    padl = maxD + 1
    d2p = jnp.concatenate(
        [
            jnp.full((padl, 128), _OOB, jnp.int32),
            disp2,
            # 16 tail pad rows: the two-stage base slice reaches up to
            # minX1 + 4 + Wv - 1 (q = -4 group), 3 rows past the direct
            # loop's worst case; Wv's 8-alignment can add 7 more.
            jnp.full((16, 128), _OOB, jnp.int32),
        ],
        axis=0,
    )
    if df_ref is None:
        d16 = d16_ref[...]
        d_f = jnp.right_shift(d16, 4)
        d_c = jnp.right_shift(d16 + 15, 4)
    else:
        d_f = df_ref[...]
        d_c = dc_ref[...]
    r_f = jnp.bitwise_and(d_f, 3)
    q_f = d_f - r_f
    rc5 = r_f + (d_c - d_f)  # in [0, 4]: lane of v_c within the U maps
    U = [jnp.full((Wv, 128), _OOB, jnp.int32) for _ in range(5)]
    for jq in range(-1, maxD // 4 + 1):
        base = padl + minX1 - 4 * jq - 4  # offset of t = -4
        slq = d2p[base : base + Wv + 4]
        hit = q_f == 4 * jq
        U = [jnp.where(hit, slq[4 - i : 4 - i + Wv], u) for i, u in enumerate(U)]
    # U[i] holds d2p[x + minX1 - (4q + i)]; v_f = U[r_f], v_c = U[rc5].
    v_f = U[0]
    v_c = U[0]
    for i in range(1, 5):
        if i < 4:
            v_f = jnp.where(r_f == i, U[i], v_f)
        v_c = jnp.where(rc5 == i, U[i], v_c)
    # The direct loop only matched dd >= mindisp - 1; lookups below that
    # (invalid pixels' d_f = -1 when mindisp > 0) must keep the _OOB
    # default so the fail mask stays bit-identical.
    if mindisp > 0:
        v_f = jnp.where(d_f >= mindisp - 1, v_f, jnp.int32(_OOB))
        v_c = jnp.where(d_c >= mindisp - 1, v_c, jnp.int32(_OOB))

    fail_f = (v_f >= mindisp) & (jnp.abs(v_f - d_f) > max_diff)
    fail_c = (v_c >= mindisp) & (jnp.abs(v_c - d_c) > max_diff)
    fail_ref[...] = (fail_f & fail_c).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("W", "ndisp", "mindisp", "max_diff", "interpret"),
)
def lr_fail_pallas(
    minS: jnp.ndarray,
    best: jnp.ndarray,
    d_f: jnp.ndarray,
    d_c: jnp.ndarray,
    W: int,
    ndisp: int,
    mindisp: int,
    max_diff: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, Wv) LR-failure mask (True = invalidate), cv2 semantics.

    Args:
      minS, best: (H, Wv) int32 WTA cost/winner over the valid x range
        (full-frame x = valid x + minX1, minX1 = mindisp + ndisp).
      d_f, d_c: (H, Wv) int32 floor/ceil of the subpixel disparity.
      W: full frame width.
    """
    H, Wv = minS.shape
    maxD = mindisp + ndisp
    minX1 = max(maxD, 0)
    assert ndisp + abs(mindisp) < (1 << 11), "disparity exceeds pack field"
    assert mindisp >= 0

    pack = minS * 2048 + (best + mindisp)
    pack_full = jnp.full((H, W + maxD), _SENTINEL, jnp.int32)
    pack_full = jax.lax.dynamic_update_slice(pack_full, pack, (0, minX1))

    Hp = ((H + 127) // 128) * 128
    padh = lambda a, fill: jnp.pad(a, ((0, Hp - H), (0, 0)), constant_values=fill)
    # Transpose to (x, y): all in-kernel shifts become sublane slices.
    packT = padh(pack_full, _SENTINEL).T
    dfT = padh(d_f, 0).T
    dcT = padh(d_c, 0).T
    Wfull = W + maxD
    if Wfull % 8:
        extra = 8 - Wfull % 8
        packT = jnp.pad(packT, ((0, extra), (0, 0)), constant_values=_SENTINEL)
        Wfull += extra
    Wvp = ((Wv + 7) // 8) * 8
    if Wvp != Wv:
        dfT = jnp.pad(dfT, ((0, Wvp - Wv), (0, 0)))
        dcT = jnp.pad(dcT, ((0, Wvp - Wv), (0, 0)))

    kern = functools.partial(
        _lr_kernel, W, Wvp, ndisp, mindisp, minX1, int(max_diff)
    )
    spec = lambda w: pl.BlockSpec((w, 128), lambda j: (0, j), memory_space=pltpu.VMEM)
    # Width-scaled scoped-VMEM cap (the sgm_pallas._horiz_vmem_limit
    # pattern): double-buffered (Wfull/Wvp, 128) i32 blocks plus ~8 live
    # (Wfull, 128) kernel temporaries (pack/band/packed/disp2/d2p/v_f/
    # v_c). The 16 MB compiler default fits 720p but OOMs at 1080p
    # ("scoped allocation 18.08M ... limit 16.00M", parity_bench
    # config #5 with the row-stacked assemble).
    blocks = 2 * (Wfull + 3 * Wvp) * 128 * 4
    temps = 8 * Wfull * 128 * 4
    want = int((blocks + temps) * 1.5) + 2 * 1024 * 1024
    failT = pl.pallas_call(
        kern,
        grid=(Hp // 128,),
        in_specs=[spec(Wfull), spec(Wvp), spec(Wvp)],
        out_specs=spec(Wvp),
        out_shape=jax.ShapeDtypeStruct((Wvp, Hp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, want))
        ),
        interpret=interpret,
    )(packT, dfT, dcT)
    return failT[:Wv, :H].T.astype(bool)


@functools.partial(
    jax.jit,
    static_argnames=("W", "ndisp", "mindisp", "max_diff", "interpret"),
)
def lr_fail_pallas_packed(
    pack: jnp.ndarray,
    d16: jnp.ndarray,
    W: int,
    ndisp: int,
    mindisp: int,
    max_diff: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, Wv) LR-failure mask from the fused-WTA outputs.

    Same semantics as :func:`lr_fail_pallas`, but takes the kernel-built
    ``pack`` (minS*2048 + best_abs + mindisp, straight from
    banded_pallas._wta_fused_kernel) and the 16x fixed-point disparity
    ``d16`` — floor/ceil derive in-kernel, so only TWO maps transpose
    into the (x, y) lane layout instead of three, and the XLA pack-build
    pass disappears.
    """
    H, Wv = pack.shape
    maxD = mindisp + ndisp
    minX1 = max(maxD, 0)
    assert ndisp + abs(mindisp) < (1 << 11), "disparity exceeds pack field"
    assert mindisp >= 0

    pack_full = jnp.full((H, W + maxD), _SENTINEL, jnp.int32)
    pack_full = jax.lax.dynamic_update_slice(pack_full, pack, (0, minX1))

    Hp = ((H + 127) // 128) * 128
    padh = lambda a, fill: jnp.pad(a, ((0, Hp - H), (0, 0)), constant_values=fill)
    packT = padh(pack_full, _SENTINEL).T
    dT = padh(d16, 0).T
    Wfull = W + maxD
    if Wfull % 8:
        extra = 8 - Wfull % 8
        packT = jnp.pad(packT, ((0, extra), (0, 0)), constant_values=_SENTINEL)
        Wfull += extra
    Wvp = ((Wv + 7) // 8) * 8
    if Wvp != Wv:
        dT = jnp.pad(dT, ((0, Wvp - Wv), (0, 0)))

    kern = functools.partial(
        _lr_kernel, W, Wvp, ndisp, mindisp, minX1, int(max_diff)
    )
    spec = lambda w: pl.BlockSpec((w, 128), lambda j: (0, j), memory_space=pltpu.VMEM)
    # Width-scaled scoped-VMEM cap (see lr_fail_pallas).
    blocks = 2 * (Wfull + 2 * Wvp) * 128 * 4
    temps = 8 * Wfull * 128 * 4
    want = int((blocks + temps) * 1.5) + 2 * 1024 * 1024
    failT = pl.pallas_call(
        kern,
        grid=(Hp // 128,),
        in_specs=[spec(Wfull), spec(Wvp)],
        out_specs=spec(Wvp),
        out_shape=jax.ShapeDtypeStruct((Wvp, Hp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, want))
        ),
        interpret=interpret,
    )(packT, dT)
    return failT[:Wv, :H].T.astype(bool)
