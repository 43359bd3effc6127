"""Round 2 of the r3d A/B (combos of the winning arms of hier_ab_r3d):

  scan_cpal  — full-res LR scan + coarse LR pallas
  scan_noclr — full-res LR scan + coarse LR OFF
  scan_scan  — full-res LR scan + coarse LR scan (r3d lrscan, re-run)
  pal_noclr  — full-res LR pallas + coarse LR OFF (r3d noclr, re-run)

r3d verdicts this builds on: full-res Pallas LR ~168.8 (noisy) vs scan
174.0; coarse Pallas LR 177.6; coarse LR off 178.0 at agreement 0.9954
(bench scene; adversarial pins checked separately on CPU).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, _agreement, H, W, D, N
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier_batch

    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        speckle_window_size=100, speckle_range=2, num_paths=4,
        disp12_max_diff=1,
    )
    p_scan = StereoSGBMParams(backend="scan", **base)
    p_auto = StereoSGBMParams(**base)  # auto -> pallas full-res LR on TPU

    left, right = _scene()
    print("computing exact8 reference...", flush=True)
    ref = np.asarray(
        jax.jit(
            lambda l, r: stereo_sgbm(l, r, StereoSGBMParams(
                num_disparities=D, block_size=5, uniqueness_ratio=10,
                disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
            ))
        )(jnp.asarray(left), jnp.asarray(right))
    )

    variants = {
        "scan_cpal": (p_scan, HIER_FAST, "pallas"),
        "scan_noclr": (p_scan, HIER_FAST._replace(coarse_lr=-1), None),
        "scan_scan": (p_scan, HIER_FAST, None),
        "pal_noclr": (p_auto, HIER_FAST._replace(coarse_lr=-1), None),
    }

    P = 128 // HIER_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    def run(pp, hp, coarse_backend):
        old = hier._COARSE_LR_BACKEND
        if coarse_backend is not None:
            hier._COARSE_LR_BACKEND = coarse_backend
        try:
            fn = lambda l, r: stereo_sgbm_hier_batch(l, r, pp, hp)
            out = np.asarray(jax.jit(fn)(lb, rb))[0]
            agree = _agreement(out, ref)

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
            return agree, reps
        finally:
            hier._COARSE_LR_BACKEND = old

    for name, (pp, hp, cb) in variants.items():
        try:
            agree, reps = run(pp, hp, cb)
            print(
                f"{name:10s} agree={agree:.4f}  mpxs={' '.join(f'{r:.1f}' for r in reps)}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
