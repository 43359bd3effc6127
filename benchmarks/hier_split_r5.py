"""r5 stage split of the hier4x3 frame budget (chip, chained-jit).

Same subtractive method as benchmarks/hier_split_r4.py at the round-5
headline config (720p, D=128, 32-frame band-4 G=2 packs):

  coarse  — stage 1 only (8 coarse sub-packs + assemble)
  prior   — stages 1+1b (adds the 2 mid sub-packs, assemble, splice)
  full    — the whole pipeline
  fullnsp — full with speckle off
  fullnlr — full with the LR check off

Run alone on an idle chip; redirect to a file.
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
    from stereo_vision_tpu.stereo.hier import (
        HIER4_FAST,
        hier_batch_prior,
        stereo_sgbm_hier_batch,
    )

    N = 50
    left, right = _scene()
    P = 128 // HIER4_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))
    p3 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
    )

    def timed(fn, label):
        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                out = fn(li, r)
                return jnp.sum(out[:, -1, -1]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c

        _ = np.asarray(chained(lb, rb))
        reps = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chained(lb, rb))
            dt = (time.perf_counter() - t0) / N
            reps.append(dt * 1000 / P)
        print(
            f"{label:10s} ms/frame={' '.join(f'{r:.3f}' for r in reps)} "
            f"(mpxs={H * W / (min(reps) / 1000) / 1e6:.1f})",
            flush=True,
        )

    variants = {
        "full": lambda l, r: stereo_sgbm_hier_batch(l, r, p3, HIER4_FAST),
        "fullnsp": lambda l, r: stereo_sgbm_hier_batch(
            l, r, p3._replace(speckle_window_size=0), HIER4_FAST
        ),
        "fullnlr": lambda l, r: stereo_sgbm_hier_batch(
            l, r, p3._replace(disp12_max_diff=-1), HIER4_FAST
        ),
        "prior": lambda l, r: hier_batch_prior(l, r, p3, HIER4_FAST)[1],
        "coarse": lambda l, r: hier_batch_prior(
            l, r, p3, HIER4_FAST._replace(mid_factor=None)
        )[0],
    }
    if len(sys.argv) > 1:
        variants = {k: v for k, v in variants.items() if sys.argv[1] in k}
    for label, fn in variants.items():
        try:
            timed(fn, label)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
