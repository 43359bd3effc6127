"""Speckle filter as ONE Pallas kernel: all phases VMEM-resident.

Same exact algorithm as stereo_vision_tpu.stereo.postprocess.speckle_filter
(cv2.filterSpeckles parity; see that docstring for the proof), restructured
for TPU execution cost:

- the XLA formulation runs ~5R ≈ 495 `lax.while` iterations whose bodies
  round-trip every map through HBM (~5.4 us/round measured) plus ~6 ms of
  fixed overhead at 720p;
- here the whole image's state (labels, arrival rounds, subtree sums,
  taint, parent directions, adjacency masks) lives in VMEM scratch across
  a single grid, and the 2R taint-propagation rounds run FUSED with the
  R up-sweep + R down-broadcast rounds (they touch disjoint state), so the
  grid is 3R+3 steps instead of 5R XLA iterations.

Mosaic constraints shape the arithmetic (both hit as compiler crashes):
- concatenate cannot handle i1 vectors, and i1 masks produced by
  comparing SHIFTED (concatenated) operands carry layouts that cannot be
  relayout'd into boolean and/or ops. So ALL state is float32 and boolean
  algebra is arithmetic: masks are 0/1 floats, AND is multiply, OR is
  saturating add, equality of small ints is 1 - min(|a-b|, 1). Every
  value is an integer < 2^24 (flat labels <= H*W, counts <= H*W, rounds
  <= R), so f32 arithmetic is exact.

Grid layout (R = max_speckle_size - 1):
  step 0              masks from disp; lab = iota, A = 0
  steps 1..R          phase 1: label min-propagation, stamp A
  step R+1            phase 2: parent directions; init s = 1, taint seeds
  steps R+2..2R+1     phase 3 up-sweep + one taint round each
  step  2R+2          total = where(root, s, 0)  [in-place in s]
  steps 2R+3..3R+2    phase 4 down-broadcast + one taint round each,
                      then remove + emit at the last step

A/B verdict (2026-08-17, 720p/S=100, v5e, chained-jit): **18.7 ms vs
9.9 ms for the XLA formulation — 2x SLOWER, kept out of the pipeline.**
Exactness holds on-TPU (737k removed pixels bit-identical). Two causes:
(a) the f32 boolean emulation roughly doubles the per-round op count vs
XLA's native i1 vectors, and (b) the phase dispatch appears to pay for
more than the active branch per grid step. The XLA while-loop overhead
this kernel was built to kill (~5.4 us/round) is smaller than both
costs. Retained as a tested capability for future Mosaic toolchains
(i1 concatenate/relayout support would remove (a)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Neighbor offsets; _OPP[i] is the opposite direction's index. The shift
# orientation is globally mirrored vs the XLA version's nb() — a direction
# relabeling, under which the algorithm is invariant (the direction set is
# symmetric and _OPP pairs are preserved); exact equality is asserted in
# tests either way.
_OFFS = ((1, 0), (-1, 0), (0, 1), (0, -1))
_OPP = (1, 0, 3, 2)


def _nb(a, i, fill):
    """``a`` shifted one pixel along direction i (2-D f32 block)."""
    dy, dx = _OFFS[i]
    H, W = a.shape
    if dy:
        pad = jnp.full((1, W), fill, a.dtype)
        a = jnp.concatenate([pad, a[:-1]] if dy > 0 else [a[1:], pad], axis=0)
    if dx:
        pad = jnp.full((H, 1), fill, a.dtype)
        a = jnp.concatenate([pad, a[:, :-1]] if dx > 0 else [a[:, 1:], pad], axis=1)
    return a


def _eq01(a, b):
    """1.0 where two small-int f32 arrays are equal, else 0.0."""
    return 1.0 - jnp.minimum(jnp.abs(a - b), 1.0)


def _speckle_kernel(
    R, S, max_diff, invalid_value,
    disp_ref, out_ref,
    lab_ref, A_ref, s_ref, taint_ref, pdir_ref,
    m0_ref, m1_ref, m2_ref, m3_ref,
):
    r = pl.program_id(0)
    H, W = disp_ref.shape
    m_refs = (m0_ref, m1_ref, m2_ref, m3_ref)
    BIG = jnp.float32(H * W)

    @pl.when(r == 0)
    def _init():
        disp = disp_ref[...]
        v01 = (disp > invalid_value).astype(jnp.float32)
        for i in range(4):
            nbv = _nb(v01, i, jnp.float32(0.0))
            nbd = _nb(disp, i, jnp.float32(1e30))
            # |nbd - disp| <= max_diff without comparing a shifted
            # operand: the excess over max_diff is 0 exactly when within.
            over = jnp.minimum(jnp.maximum(jnp.abs(nbd - disp) - max_diff, 0.0), 1.0)
            m_refs[i][...] = v01 * nbv * (1.0 - jnp.minimum(over * 1e30, 1.0))
        iota = (
            jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
            + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ).astype(jnp.float32)
        lab_ref[...] = iota
        A_ref[...] = jnp.zeros((H, W), jnp.float32)

    @pl.when((r >= 1) & (r <= R))
    def _phase1():
        lab = lab_ref[...]
        new = lab
        for i in range(4):
            m = m_refs[i][...]
            cand = _nb(lab, i, BIG) * m + BIG * (1.0 - m)
            new = jnp.minimum(new, cand)
        # labels are integers: new < lab iff lab - new >= 1.
        changed = jnp.minimum(jnp.maximum(lab - new, 0.0), 1.0)
        A_ref[...] = A_ref[...] * (1.0 - changed) + r.astype(jnp.float32) * changed
        lab_ref[...] = new

    @pl.when(r == R + 1)
    def _phase2():
        lab = lab_ref[...]
        A = A_ref[...]
        pdir = jnp.full((H, W), 4.0, jnp.float32)
        seed = jnp.zeros((H, W), jnp.float32)
        for i in (3, 2, 1, 0):
            m = m_refs[i][...]
            eq = _eq01(jnp.minimum(jnp.abs(_nb(lab, i, BIG) - lab), 1.0), 0.0)
            lt = jnp.minimum(jnp.maximum(A - _nb(A, i, BIG), 0.0), 1.0)
            ok = m * eq * lt  # first qualifying dir wins via overwrite order
            pdir = pdir * (1.0 - ok) + jnp.float32(i) * ok
        for i in range(4):
            ne = jnp.minimum(jnp.abs(_nb(lab, i, BIG) - lab), 1.0)
            seed = jnp.minimum(seed + m_refs[i][...] * ne, 1.0)
        pdir_ref[...] = pdir
        taint_ref[...] = seed
        s_ref[...] = jnp.ones((H, W), jnp.float32)

    def taint_round():
        t = taint_ref[...]
        acc = t
        for i in range(4):
            acc = acc + m_refs[i][...] * _nb(t, i, jnp.float32(0.0))
        taint_ref[...] = jnp.minimum(acc, 1.0)

    @pl.when((r >= R + 2) & (r <= 2 * R + 1))
    def _phase3():
        pdir = pdir_ref[...]
        s = s_ref[...]
        out = jnp.ones((H, W), jnp.float32)
        for i in range(4):
            child = _eq01(_nb(pdir, i, jnp.float32(4.0)), jnp.float32(_OPP[i]))
            out = out + child * _nb(s, i, jnp.float32(0.0))
        s_ref[...] = out
        taint_round()

    @pl.when(r == 2 * R + 2)
    def _total_init():
        s_ref[...] = s_ref[...] * _eq01(pdir_ref[...], 4.0)

    @pl.when((r >= 2 * R + 3) & (r <= 3 * R + 2))
    def _phase4():
        pdir = pdir_ref[...]
        t = s_ref[...]
        out = t
        for i in range(4):
            sel = _eq01(pdir, jnp.float32(i))  # pdir is unshifted/canonical
            out = out * (1.0 - sel) + sel * _nb(t, i, jnp.float32(0.0))
        s_ref[...] = out
        taint_round()

    @pl.when(r == 3 * R + 2)
    def _emit():
        disp = disp_ref[...]
        v01 = (disp > invalid_value).astype(jnp.float32)
        # total <= S iff S + 1 - total >= 1 (integers).
        small = jnp.minimum(jnp.maximum(jnp.float32(S + 1) - s_ref[...], 0.0), 1.0)
        rm = v01 * (1.0 - taint_ref[...]) * small
        out_ref[...] = disp * (1.0 - rm) + jnp.float32(invalid_value) * rm


@functools.partial(
    jax.jit,
    static_argnames=("max_diff", "max_speckle_size", "invalid_value", "interpret"),
)
def speckle_filter_pallas(
    disp: jnp.ndarray,
    max_diff: float = 1.0,
    max_speckle_size: int = 100,
    invalid_value: float = -1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """VMEM-resident speckle filter; exact-equal to postprocess.speckle_filter
    (asserted in tests/test_speckle.py)."""
    H0, W0 = disp.shape
    S = int(max_speckle_size)
    if S <= 0:
        return disp
    R = S - 1
    # Pad to tile multiples with invalid pixels: invalid never joins a
    # blob and is never removed, so padding is semantics-preserving.
    H = ((H0 + 7) // 8) * 8
    W = ((W0 + 127) // 128) * 128
    d = disp.astype(jnp.float32)
    if (H, W) != (H0, W0):
        d = jnp.pad(d, ((0, H - H0), (0, W - W0)), constant_values=invalid_value)

    kern = functools.partial(
        _speckle_kernel, R, S, float(max_diff), float(invalid_value)
    )
    out = pl.pallas_call(
        kern,
        grid=(3 * R + 3,),
        in_specs=[pl.BlockSpec((H, W), lambda r: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, W), lambda r: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32) for _ in range(9)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d)
    return out[:H0, :W0].astype(disp.dtype)
