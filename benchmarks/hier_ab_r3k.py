"""r3k A/B: full-res LR backend x assemble stacking (hier16x3 config).

The trace (benchmarks/trace_hier.py, 2026-08-18) puts the full-res LR
at 0.79 ms/frame (and_select + select_select fusions — 17 XLA chains).
Both alternatives exist but were only ever measured separately:

  scan-pf    — XLA chains, per-frame (current default)
  pallas-pf  — Pallas LR kernel, per-frame (r3d: wash vs scan)
  scan-rs    — XLA chains, row-stacked (r3b: ~3% slower — longer chains)
  pallas-rs  — Pallas LR kernel, row-stacked: ONE kernel dispatch for
               all 8 frames (the kernel lanes rows independently, so
               frame mixing inside a 128-row block is exact; 8*720 =
               45 blocks exactly). NEW combination.

Bit-exactness: lr_fail backends are pinned equal (tests/test_lr_pallas)
and row-stacking is pinned bit-identical (_PACK_ASSEMBLE note).
Run alone on the chip; redirect output to a file.
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
    variants = {
        "scan-pf": ("scan", False),
        "pallas-pf": ("pallas", False),
        "scan-rs": ("scan", True),
        "pallas-rs": ("pallas", True),
    }

    def run(backend, stacked):
        hier._PACK_ASSEMBLE = stacked
        p = StereoSGBMParams(backend=backend, **base)
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

    for name, (bk, st) in variants.items():
        try:
            reps = run(bk, st)
            print(f"{name:10s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    hier._PACK_ASSEMBLE = False


if __name__ == "__main__":
    main()
