"""r4b chip A/B: band-8 two-level (HIER8_FAST) vs the hier16x3 headline.

Both modes run the full BASELINE config #2 (720p, D=128-equivalent,
subpixel + uniqueness + LR + speckle) through the packed Pallas kernels,
3-path full-res. hier8x3 packs 16 frames per 128-lane program behind a
1/2-res band-16 mid prior (verdict-r3 #1: the last untested
D-proportional halving). CPU agreement pins for HIER8_FAST pass
(benchmarks/hier_ab_r4a_agreement.py); pallas-vs-scan exactness is
pinned by TestHierBatch. Run alone on an idle chip; redirect to a file.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, _agreement, H, W, D
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import (
        HIER_FAST,
        HIER8_FAST,
        stereo_sgbm_hier_batch,
    )

    N = 50
    left, right = _scene()
    p3 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
    )

    outs = {}

    def run(name, hp):
        P = 128 // hp.band
        lb = jnp.asarray(np.stack([left] * P))
        rb = jnp.asarray(np.stack([right] * P))
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p3, hp)
        outs[name] = np.asarray(jax.jit(fn)(lb, rb))[0]

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
        print(f"{name} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)

    for name, hp in (("hier16x3", HIER_FAST), ("hier8x3", HIER8_FAST)):
        try:
            run(name, hp)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    if len(outs) == 2:
        a = _agreement(outs["hier8x3"], outs["hier16x3"])
        print(f"agreement hier8x3 vs hier16x3 (within 1px): {a:.4f}", flush=True)


if __name__ == "__main__":
    main()
