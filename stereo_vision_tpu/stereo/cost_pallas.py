"""Fused Pallas kernel: BT pixel cost + box filter, one pass over rows.

The XLA formulation of the SGBM cost stage reads the right-image arrays
along a disparity diagonal (for output lane d it needs column x-d), which
lowers to slow gathers — measured ~28 ms of the 720p/D=128 frame. This
kernel instead builds each row's shifted stacks IN VMEM with a
log-composition of static sublane shifts (7 steps for D<=128) and keeps a
rolling 5-row pixel-cost window in scratch, so the cost volume is written
to HBM exactly once.

Semantics identical to stereo_vision_tpu.stereo.sgbm.compute_cost_volume
(tests assert exact equality): BT on the clipped-Sobel channel plus
(BT on raw >> 2), box-summed over block_size x block_size with replicate
borders. Currently specialized to block_size <= 5 windows via the rolling
window depth; other sizes fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bf16 shifted-stack workspace: values <= 255 are exact in bf16 and the
# packing should halve the VPU cost of the 7 masked shifts, but the A/B
# measured NO win (12.7/14.5 vs 13.0/13.0 ms on a noisy chip) — the
# masked-shift loop is evidently not the limiter the instruction count
# suggested. Kept available for future re-measurement; exactness is
# asserted either way (tests/test_sgm_pallas.py::test_cost_volume_pallas_exact).
_BF16_STACK = False


def _build_shifted_ext(arr_row, W: int, D: int):
    """Like _build_shifted but returns (W+2, D): rows x = -1 .. W, so the
    caller can derive the shifted half-sample extrema from ONE stack via
    sublane shifts (value slices take arbitrary offsets).

    The workspace is bfloat16: every input value is an integer <= 255,
    exact in bf16 (8 mantissa bits cover ints to 256), and packing two
    values per f32 lane halves the VPU cost of the 7 masked shifts — the
    stack builds are ~half the kernel's instructions (docs/sgbm_roofline).
    The caller converts the slices back to f32 before any arithmetic that
    could exceed 256 (the half-sample sums reach 510)."""
    Wpd = arr_row.shape[0]
    # Minor-dim insertion is 32-bit-only on Mosaic: broadcast in f32 first,
    # convert the 2-D workspace to bf16 after.
    dt = jnp.bfloat16 if _BF16_STACK else jnp.float32
    B = jnp.broadcast_to(arr_row[:, None], (Wpd, D)).astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Wpd, D), 1)
    shift = 1
    while shift < D:
        z = jnp.zeros((shift, D), B.dtype)
        shifted = jnp.concatenate([z, B[:-shift]], axis=0)
        take = (lane & shift) != 0
        B = jnp.where(take, shifted, B)
        shift *= 2
    return B[D - 1 : D + W + 1, :].astype(jnp.float32)


def _shifted_with_extrema(arr_row, W: int, D: int):
    """One stack build -> (M, v0s, v1s): the shifted values and shifted
    BT half-sample extrema. vl[x-d] = floor((v[x-d] + v[x-d-1]) / 2) is a
    sublane shift of the same stack (the left edge-replicate padding
    reproduces cv2's vl[0] = v[0] rule; the caller's right-edge replicate
    reproduces vr[W-1] = v[W-1])."""
    Ms = _build_shifted_ext(arr_row, W, D)
    M = Ms[1 : W + 1]
    vl = jnp.floor((M + Ms[0:W]) * 0.5)
    vr = jnp.floor((M + Ms[2 : W + 2]) * 0.5)
    v0 = jnp.minimum(jnp.minimum(vl, vr), M)
    v1 = jnp.maximum(jnp.maximum(vl, vr), M)
    return M, v0, v1


def _build_shifted(arr_row, W: int, D: int):
    """(Wpd,) int16 padded row -> (W, D) matrix M[x, d] = row[x + D - 1 - d]
    via log2(D) masked sublane shifts on a (Wpd, D) workspace.

    The workspace starts as B0[x', d] = row[x'] broadcast along lanes; after
    the masked shifts B[x', d] = row[x' - d]; the slice [D:D+W) yields M
    (the row is left-padded by D, keeping the slice 8-sublane aligned).
    """
    Wpd = arr_row.shape[0]
    B = jnp.broadcast_to(arr_row[:, None], (Wpd, D))
    lane = jax.lax.broadcasted_iota(jnp.int32, (Wpd, D), 1)
    shift = 1
    while shift < D:
        z = jnp.zeros((shift, D), B.dtype)
        shifted = jnp.concatenate([z, B[:-shift]], axis=0)
        take = (lane & shift) != 0
        B = jnp.where(take, shifted, B)
        shift *= 2
    return B[D : D + W, :]  # static slice (Mosaic lacks value dynamic_slice)


def _bt_row(l, u0, u1, v_m, v0_m, v1_m):
    """BT cost row: left scalars broadcast vs right shifted matrices."""
    lb = l[:, None]
    c0 = jnp.maximum(jnp.maximum(0, lb - v1_m), v0_m - lb)
    c1 = jnp.maximum(jnp.maximum(0, v_m - u1[:, None]), u0[:, None] - v_m)
    return jnp.minimum(c0, c1)


def _cost_kernel(
    H, W, D, bs, x_off,
    ls_ref, lu0s_ref, lu1s_ref, lr_ref, lu0r_ref, lu1r_ref,
    vs_ref, vr_ref,
    out_ref,
    P_ref, S_ref,
):
    """Grid step r (r in [0, H + bs//2)): compute pixel-cost row
    min(r, H-1), roll it into the 5-row window, emit box row r - bs//2.

    P_ref: (bs, W, D) circular pixel-row buffer. S_ref: (1, W, D) running
    column sum over the window. All float32 — v5e Mosaic has no int16
    vector arithmetic at all (subtract aborts the compiler); every value
    is an exact small integer in f32.
    """
    r = pl.program_id(0)
    half = bs // 2
    src = jnp.minimum(r, H - 1)
    row_in_block = jax.lax.rem(src, jnp.int32(8))
    Wpd = W + D

    def take(ref, n):
        # Extract one row from the 8-row block at a dynamic offset via a
        # masked sublane reduction (dynamic sublane slices must be 8-aligned
        # on Mosaic). f32 math throughout: Mosaic lacks int16 vector
        # min/max/reductions; all values are small integers, exact in f32.
        blk = ref[:, :n].astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        return jnp.sum(jnp.where(rows == row_in_block, blk, 0.0), axis=0)

    # Build the row's pixel cost: sobel channel + (raw channel >> 2).
    # One shifted-stack build per channel; the shifted half-extrema derive
    # from sublane shifts of the same stack (3x fewer log-shift builds).
    vs_m, v0s_m, v1s_m = _shifted_with_extrema(take(vs_ref, Wpd + 1), W, D)
    c_sob = _bt_row(
        take(ls_ref, W), take(lu0s_ref, W), take(lu1s_ref, W), vs_m, v0s_m, v1s_m
    )
    vr_m, v0r_m, v1r_m = _shifted_with_extrema(take(vr_ref, Wpd + 1), W, D)
    c_raw = _bt_row(
        take(lr_ref, W), take(lu0r_ref, W), take(lu1r_ref, W), vr_m, v0r_m, v1r_m
    )
    p_new = c_sob + jnp.floor(c_raw / 4.0)

    slot = jax.lax.rem(r, jnp.int32(bs))

    @pl.when(r == 0)
    def _init():
        S_ref[0] = jnp.zeros_like(p_new)
        for k in range(bs):
            P_ref[k] = jnp.zeros_like(p_new)

    p_old = P_ref[pl.ds(slot, 1)][0]
    S_ref[0] = S_ref[0] + p_new - p_old
    P_ref[pl.ds(slot, 1)] = p_new[None]

    # Emit output row r - half once the window covers it. Bottom-edge
    # replication: rows below 0 replicate row 0 — add the missing copies.
    @pl.when(r >= half)
    def _emit():
        s = S_ref[0]
        n_missing = jnp.maximum(half + half - r, 0)  # copies of row 0 absent
        p0 = P_ref[0]  # row 0 lives in slot 0 while r < bs
        s = s + n_missing.astype(jnp.float32) * p0
        # Box along W with replicate edges; emit only x >= x_off (the cv2
        # valid aggregation range) so the caller never slices a copy.
        left_edge = s[:1]
        right_edge = s[-1:]
        sp = jnp.concatenate([left_edge] * half + [s] + [right_edge] * half, axis=0)
        Wo = W - x_off
        acc = sp[x_off : x_off + Wo]
        for k in range(1, bs):
            acc = acc + sp[x_off + k : x_off + k + Wo]
        # Emit int16 (windowed cost < 15k): halves the volume's HBM write
        # here and its reads in the aggregation kernels.
        out_ref[0] = acc.astype(jnp.int16)


@functools.partial(
    jax.jit, static_argnames=("ndisp", "block_size", "x_offset", "interpret")
)
def cost_volume_pallas(
    ls: jnp.ndarray,
    rs: jnp.ndarray,
    lraw: jnp.ndarray,
    rraw: jnp.ndarray,
    ndisp: int | None = None,
    block_size: int = 5,
    x_offset: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed BT cost volume.

    Args:
      ls, rs: (H, W) clipped-Sobel images (int).
      lraw, rraw: (H, W) raw images (int).
      ndisp: number of disparities (power-of-two <= 128 for the log-shift;
        others fall back upstream).

    Returns:
      (H, W - x_offset, D) float32 box-summed cost for columns
      x >= x_offset (exact integers; equals compute_cost_volume sliced,
      which tests assert).
    """
    H, W = ls.shape
    D = int(ndisp)
    half = block_size // 2
    assert x_offset % 8 == 0, "x_offset must be sublane-aligned"
    Wo = W - x_offset

    def half_extrema(a):
        l_ = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        r_ = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        vl = (a + l_) // 2
        vr = (a + r_) // 2
        vl = vl.at[:, 0].set(a[:, 0])
        vr = vr.at[:, -1].set(a[:, -1])
        return jnp.minimum(jnp.minimum(vl, vr), a), jnp.maximum(jnp.maximum(vl, vr), a)

    def prep_left(a):
        u0, u1 = half_extrema(a)
        c = lambda x: x.astype(jnp.int16)
        return c(a), c(u0), c(u1)

    def prep_right(a):
        # Left-pad by D and right-pad by 1 with edge replication: the
        # kernel derives the half-extrema from this single padded row
        # (left replicate -> cv2's vl[0]=v[0]; right -> vr[W-1]=v[W-1]).
        return jnp.concatenate(
            [jnp.repeat(a[:, :1], D, axis=1), a, a[:, -1:]], axis=1
        ).astype(jnp.int16)

    l_s, lu0_s, lu1_s = prep_left(ls)
    l_r, lu0_r, lu1_r = prep_left(lraw)
    v_s = prep_right(rs)
    v_r = prep_right(rraw)

    # Pad H to a multiple of 8 for the (8, width) input blocks.
    Hp = ((H + 7) // 8) * 8
    padh = lambda a: jnp.pad(a, ((0, Hp - H), (0, 0)), mode="edge")
    lefts = [padh(a) for a in (l_s, lu0_s, lu1_s, l_r, lu0_r, lu1_r)]
    rights = [padh(a) for a in (v_s, v_r)]
    Wpd = W + D
    # Pad widths to lane multiples (right arrays carry one extra edge col).
    Wl = ((W + 127) // 128) * 128
    Wr = ((Wpd + 1 + 127) // 128) * 128
    lefts = [jnp.pad(a, ((0, 0), (0, Wl - W))) for a in lefts]
    rights = [jnp.pad(a, ((0, 0), (0, Wr - (Wpd + 1))), mode="edge") for a in rights]

    in_row_spec_l = pl.BlockSpec(
        (8, Wl), lambda r: (jnp.minimum(r, H - 1) // 8, 0), memory_space=pltpu.VMEM
    )
    in_row_spec_r = pl.BlockSpec(
        (8, Wr), lambda r: (jnp.minimum(r, H - 1) // 8, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, Wo, D),
        lambda r: (jnp.clip(r - half, 0, H - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )

    kern = functools.partial(_cost_kernel, H, W, D, block_size, x_offset)
    out = pl.pallas_call(
        kern,
        grid=(H + half,),
        in_specs=[in_row_spec_l] * 6 + [in_row_spec_r] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, Wo, D), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((block_size, W, D), jnp.float32),
            pltpu.VMEM((1, W, D), jnp.float32),
        ],
        interpret=interpret,
    )(*lefts, *rights)
    return out
