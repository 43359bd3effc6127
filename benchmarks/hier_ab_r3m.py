"""r3m A/B: fused WTA output (in-kernel subpixel + LR pack) vs 6-stat.

The r3j trace leaves ~0.5 ms/frame of XLA glue and 0.6 of LR around the
banded core. The fused path (banded_pallas._wta_fused_kernel +
lr_fail_pallas_packed + hier._assemble_fused) removes, per 720p pack:
  - the 48-of-128-lane 6-stat f32 WTA volume (424 MB written, 424 read
    by the unpack) -> one dense 106 MB int32 volume;
  - the XLA subpixel-parabola, pack-build and floor/ceil passes;
  - one of the three transposed LR kernel inputs.
Bit-exactness vs the scan assemble is pinned by
tests/test_banded_pallas.py::TestHierBatch::test_fused_wta_assemble_matches_scan;
this script re-checks fused == unfused ON THE CHIP (real Mosaic
lowering), then times both. Run alone on the chip; redirect to a file.
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

    # Correctness on real Mosaic lowering first: fused == unfused.
    hier._FUSED_STATS = False
    want = np.asarray(jax.jit(
        lambda l, r: stereo_sgbm_hier_batch(l, r, p, HIER_FAST))(lb, rb))
    hier._FUSED_STATS = True
    got = np.asarray(jax.jit(
        lambda l, r: stereo_sgbm_hier_batch(l, r, p, HIER_FAST))(lb, rb))
    eq = np.array_equal(got, want)
    print(f"on-chip fused == unfused: {eq} "
          f"(mismatch {np.mean(got != want):.2e})", flush=True)

    def run(fused):
        hier._FUSED_STATS = fused
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

    for name, fused in (("unfused", False), ("fused", True)):
        try:
            reps = run(fused)
            print(f"{name:8s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    hier._FUSED_STATS = True


if __name__ == "__main__":
    main()
