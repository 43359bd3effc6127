"""r3j: subtractive in-context split of the hier16x3 headline.

Each variant disables ONE postprocess stage of the full config (the
headline number is always the FULL config — this only locates cost):

  full    — the bench.py hier16x3 headline config
  noLR    — disp12_max_diff=-1 (drops the Pallas LR kernel + glue)
  noSpk   — speckle_window_size=0
  noUniq  — uniqueness_ratio=0 (drops the WTA offender group-sums)
  bare    — all three off

Subtractive deltas measured IN CONTEXT beat additive stage splits here:
the r3g downsample A/B moved the end-to-end number by ~1/10th of its
stage-split delta (XLA fuses/overlaps differently in the full program).
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
        "full": {},
        "noLR": dict(disp12_max_diff=-1),
        "noSpk": dict(speckle_window_size=0),
        "noUniq": dict(uniqueness_ratio=0),
        "bare": dict(
            disp12_max_diff=-1, speckle_window_size=0, uniqueness_ratio=0
        ),
    }

    def run(over):
        p = StereoSGBMParams(**{**base, **over})
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
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chained(lb, rb))
            dt = (time.perf_counter() - t0) / N
            reps.append((P * H * W / dt / 1e6, dt / P * 1e3))
        return reps

    for name, over in variants.items():
        try:
            reps = run(over)
            ms = min(r[1] for r in reps)
            mp = " ".join(f"{r[0]:.1f}" for r in reps)
            print(f"{name:7s} mpxs={mp}  best_ms/frame={ms:.3f}", flush=True)
        except Exception as e:
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
