"""r3n A/B: in-kernel subpixel (4-stat WTA output) vs 6-stat + XLA.

The r3n trace at the 209.9 headline showed 0.48 ms/pack of int32
floor_divide (the subpixel C-division's XLA lowering — TPUs have no
int-div hardware path) plus ~1.26 ms of stat unpack. Two stacked
changes, both bit-exact:

  a. sgbm.subpixel_disp16 computes the C division with 8 f32
     compare-accumulates (quotient magnitude <= 8 since |sm - sp| <=
     denom2; exhaustive check in TestFusedSubpixelDivision) — no int
     division anywhere. Benefits every mode incl. exact8.
  b. hier._WTA_SUB: banded_stats_pack(sub=True) finishes the parabola
     INSIDE the WTA kernel on the sel() samples it already computes
     (~20 elementwise ops, no extra MXU work — unlike the rejected r3m
     fused output) and emits 4 stats instead of 6, deleting the XLA
     subpixel pass and a third of the unpack traffic.

This script checks fused-off == sub-on == sub-off ON THE CHIP (real
Mosaic lowering), then times sub on/off — both arms include (a).
Run alone on the chip; redirect to a file.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, D, N
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier_batch

    left, right = _scene()
    P = 128 // HIER_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
    )
    p = StereoSGBMParams(backend="auto", **base)

    # Correctness on real Mosaic lowering first: sub == 6-stat.
    hier._WTA_SUB = False
    want = np.asarray(jax.jit(
        lambda l, r: stereo_sgbm_hier_batch(l, r, p, HIER_FAST))(lb, rb))
    hier._WTA_SUB = True
    got = np.asarray(jax.jit(
        lambda l, r: stereo_sgbm_hier_batch(l, r, p, HIER_FAST))(lb, rb))
    eq = np.array_equal(got, want)
    print(f"on-chip sub == 6-stat: {eq} "
          f"(mismatch {np.mean(got != want):.2e})", flush=True)

    def run(sub):
        hier._WTA_SUB = sub
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p, HIER_FAST)

        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                d = fn(li, r)
                return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c
        _ = np.asarray(chained(lb, rb))
        reps = []
        for _i in range(4):
            t0 = time.perf_counter()
            _ = np.asarray(chained(lb, rb))
            dt = (time.perf_counter() - t0) / N
            reps.append(P * H * W / dt / 1e6)
        return reps

    for name, sub in (("6stat", False), ("sub", True)):
        try:
            reps = run(sub)
            print(f"{name:8s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    hier._WTA_SUB = True


if __name__ == "__main__":
    main()
