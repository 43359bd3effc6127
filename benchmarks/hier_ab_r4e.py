"""r4e chip A/B: mid-level cost reductions for hier8x3.

The r4d CPU sweep (benchmarks/hier_ab_r4d_agreement.py) found two
pin-passing reductions of the mid level:
  midb8  — mid band 8/G4/margin 2: ONE 16-frame mid pack instead of two
           8-frame packs (mid per-frame kernel cost halves)
  midp2  — vertical-pair-only mid reduce (drops both horizontal mid
           scan kernels; midp3 FAILS occl — the asymmetric L->R-only
           smoothing is worse for placement than none)
and their combination (with mid_margin 2.5, bigjump 0.9800). This
measures the speed side at the full bench config. Run alone on an idle
chip; redirect to a file.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, D
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import HIER8_FAST, stereo_sgbm_hier_batch

    N = 50
    left, right = _scene()
    p3 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
    )
    variants = {
        "base": HIER8_FAST,
        "midb8": HIER8_FAST._replace(
            mid_band=8, mid_granularity=4, mid_margin=2.0
        ),
        "midp2+midb8": HIER8_FAST._replace(
            mid_paths=2, mid_band=8, mid_granularity=4, mid_margin=2.5
        ),
    }
    if len(sys.argv) > 1:
        variants = {k: v for k, v in variants.items() if sys.argv[1] in k}

    def run(name, hp):
        P = 128 // hp.band
        lb = jnp.asarray(np.stack([left] * P))
        rb = jnp.asarray(np.stack([right] * P))
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p3, hp)

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
        print(f"{name:12s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)

    for name, hp in variants.items():
        try:
            run(name, hp)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
