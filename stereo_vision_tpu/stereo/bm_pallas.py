"""Fully-fused Pallas StereoBM: SAD cost + box + WTA in one row pass.

Block matching has no cross-row recurrences (unlike SGM), so the whole
matcher fuses into a single kernel: per grid step one row of prefiltered
SAD costs is built (shifted stacks via the log-composition from
cost_pallas), rolled into a blockSize-deep window sum, and — once the
window is full — reduced straight to per-pixel WTA statistics. The (H, W,
D) cost volume never exists in HBM; traffic is images in, six (Hv, W)
stat maps out.

Exactness: the stats equal the stereo_vision_tpu.stereo.bm intermediate
values bit-for-bit (tests assert the final disparity maps are equal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_vision_tpu.stereo.cost_pallas import _build_shifted


def _bm_kernel(
    H, W, D, bs, cap, uniq, tex_thr,
    lp_ref, rp_ref,
    disp_ref, valid_ref,
    P_ref, S_ref, T_ref, Tsum_ref,
):
    """Grid step r: pixel-SAD row for source row r; emit WTA stats for
    window-center row r - bs + 1 once r >= bs - 1.

    Scratch: P (bs, W, D) rolling |lp - rp_shift| rows; S (1, W, D) running
    window-column sum; T (bs, W) rolling |lp - cap| rows; Tsum (1, W).
    All float32 (exact small integers).
    """
    r = pl.program_id(0)
    Wpd = W + D

    def take(ref, n):
        blk = ref[:, :n].astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        return jnp.sum(jnp.where(rows == jax.lax.rem(r, jnp.int32(8)), blk, 0.0), axis=0)

    lp = take(lp_ref, W)
    rp_m = _build_shifted(take(rp_ref, Wpd), W, D)
    p_new = jnp.abs(lp[:, None] - rp_m)          # (W, D)
    t_new = jnp.abs(lp - jnp.float32(cap))       # (W,)

    slot = jax.lax.rem(r, jnp.int32(bs))

    @pl.when(r == 0)
    def _init():
        S_ref[0] = jnp.zeros_like(p_new)
        Tsum_ref[0] = jnp.zeros_like(t_new)
        for k in range(bs):
            P_ref[k] = jnp.zeros_like(p_new)
            T_ref[k] = jnp.zeros_like(t_new)

    S_ref[0] = S_ref[0] + p_new - P_ref[pl.ds(slot, 1)][0]
    P_ref[pl.ds(slot, 1)] = p_new[None]
    Tsum_ref[0] = Tsum_ref[0] + t_new - T_ref[pl.ds(slot, 1)][0]
    T_ref[pl.ds(slot, 1)] = t_new[None]

    @pl.when(r >= bs - 1)
    def _emit():
        # Column box along W (valid: centers wsz2 .. W-wsz2-1; edges emit
        # garbage that the XLA wrapper's range mask discards).
        s = S_ref[0]
        acc = s
        for k in range(1, bs):
            shifted = jnp.concatenate(
                [s[k:], jnp.zeros((k, D), jnp.float32)], axis=0
            )
            acc = acc + shifted
        # acc[x] = sum of s[x .. x+bs-1] -> cost at center x + wsz2.
        cost = acc  # (W, D): cost for window whose LEFT edge is x

        minsad = jnp.min(cost, axis=-1, keepdims=True)
        ds = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1).astype(jnp.float32)
        best = jnp.min(jnp.where(cost == minsad, ds, jnp.float32(D)), axis=-1, keepdims=True)

        # cv2 uniqueness: any d with cost <= minsad + floor(minsad*uniq/100)
        # and |d - best| > 1 invalidates. Mosaic/interpret lower /100 to a
        # multiply by the inexact f32 reciprocal (e.g. 27000/100 ->
        # 269.99997), so nudge before the floor: true values sit on the
        # 0.01 lattice (>= 0.01 from the next integer) while the
        # reciprocal error is < 2e-4 — +0.005 is exact-safe.
        thresh = minsad + jnp.floor(minsad * jnp.float32(uniq) / 100.0 + 0.005)
        offend = (cost <= thresh) & (jnp.abs(ds - best) > 1.0)
        uok = 1.0 - jnp.max(offend.astype(jnp.float32), axis=-1, keepdims=True)

        # texture: box sum of |lp - cap| over the window. Shift along the
        # SUBLANE axis ((W, 1) layout): 1-D lane-axis slices beyond the
        # first tile don't lower on Mosaic.
        t = Tsum_ref[0][:, None]  # (W, 1)
        tacc = t
        for k in range(1, bs):
            tacc = tacc + jnp.concatenate(
                [t[k:], jnp.zeros((k, 1), jnp.float32)], axis=0
            )
        tex_ok = (tacc >= jnp.float32(tex_thr)).astype(jnp.float32)  # (W, 1)

        # subpixel neighbors at clip(best, 1, D-2)
        d0 = jnp.clip(best, 1.0, jnp.float32(D - 2))
        sel = lambda tgt: jnp.sum(jnp.where(ds == tgt, cost, 0.0), axis=-1, keepdims=True)
        c0 = sel(d0)
        cn = sel(d0 - 1.0)
        cp = sel(d0 + 1.0)
        denom = cp + cn - 2.0 * c0 + jnp.abs(cp - cn)
        delta = jnp.where(denom != 0.0, (cn - cp) / denom, 0.0)
        interior = (best > 0.0) & (best < jnp.float32(D - 1))
        disp = best + jnp.where(interior, delta, 0.0)

        ok = (uok > 0.5) & (tex_ok > 0.5)
        # Outputs are 2-D maps: Mosaic requires 8-sublane output blocks, so
        # each 8-row block is built up with masked read-modify-writes over
        # 8 consecutive grid steps (the block index changes every 8 steps,
        # keeping the buffer resident in between).
        out_row = jax.lax.rem(r - (bs - 1), jnp.int32(8))
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
        mask = rows8 == out_row
        disp_ref[...] = jnp.where(mask, disp[..., 0][None, :], disp_ref[...])
        valid_ref[...] = jnp.where(
            mask, ok[..., 0].astype(jnp.float32)[None, :], valid_ref[...]
        )


@functools.partial(
    jax.jit, static_argnames=("ndisp", "block_size", "cap", "uniq", "tex_thr", "interpret")
)
def bm_stats_pallas(
    lp: jnp.ndarray,
    rp: jnp.ndarray,
    ndisp: int,
    block_size: int,
    cap: int,
    uniq: int,
    tex_thr: int,
    interpret: bool = False,
):
    """Prefiltered images -> ('valid'-size) window-left-edge disparity +
    validity maps, everything fused on-chip.

    Args:
      lp, rp: (H, W) x-Sobel-prefiltered images (ints 0..2*cap).

    Returns:
      (disp, ok): each (H - bs + 1, W) float32 where column x corresponds
      to the window with LEFT edge x (centers offset by bs//2; columns
      beyond W - bs + 1 are garbage — the caller masks/slices).
    """
    H, W = lp.shape
    D, bs = int(ndisp), int(block_size)
    Hv = H - bs + 1
    Hvp = ((Hv + 7) // 8) * 8
    nOB = Hvp // 8

    lp16 = lp.astype(jnp.int16)
    rp_pad = jnp.concatenate(
        [jnp.repeat(rp[:, :1], D, axis=1), rp], axis=1
    ).astype(jnp.int16)

    Hp = ((H + 7) // 8) * 8
    padh = lambda a: jnp.pad(a, ((0, Hp - H), (0, 0)), mode="edge")
    Wl = ((W + 127) // 128) * 128
    Wr = ((W + D + 127) // 128) * 128
    lp_in = jnp.pad(padh(lp16), ((0, 0), (0, Wl - W)))
    rp_in = jnp.pad(padh(rp_pad), ((0, 0), (0, Wr - (W + D))))

    spec_l = pl.BlockSpec((8, Wl), lambda r: (jnp.minimum(r, H - 1) // 8, 0), memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((8, Wr), lambda r: (jnp.minimum(r, H - 1) // 8, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (8, W),
        lambda r: (jnp.clip((r - (bs - 1)) // 8, 0, nOB - 1), 0),
        memory_space=pltpu.VMEM,
    )

    kern = functools.partial(_bm_kernel, H, W, D, bs, int(cap), int(uniq), int(tex_thr))
    disp, ok = pl.pallas_call(
        kern,
        grid=(H,),
        in_specs=[spec_l, spec_r],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((Hvp, W), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((bs, W, D), jnp.float32),
            pltpu.VMEM((1, W, D), jnp.float32),
            pltpu.VMEM((bs, W), jnp.float32),
            pltpu.VMEM((1, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
        interpret=interpret,
    )(lp_in, rp_in)
    return disp[:Hv], ok[:Hv]
