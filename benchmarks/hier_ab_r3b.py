"""A/B on the real TPU: hier16 variants vs the current HIER_FAST headline.

Variants (all full config #2 semantics, timed with bench.py's chained-jit
method, agreement measured vs the bit-exact exact8 output):

  base        — HIER_FAST as shipped (speckle R = 99)
  spk48/32/16 — speckle_diameter caps (rounds scale ~5x cap)
  cf8         — coarse_factor 8 (one 8-frame coarse pack, 1/8 coarse work)
  band8       — band 8, 16 frames/pack, G=4 (quality risk A/B)

Run alone (no concurrent CPU/TPU work); output redirected to a file.
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
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier_batch

    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10, disp12_max_diff=1,
        speckle_window_size=100, speckle_range=2,
    )
    p8 = StereoSGBMParams(**base)
    p4 = StereoSGBMParams(num_paths=4, **base)

    left, right = _scene()
    print("computing exact8 reference...", flush=True)
    ref = np.asarray(
        jax.jit(lambda l, r: stereo_sgbm(l, r, p8))(
            jnp.asarray(left), jnp.asarray(right)
        )
    )

    variants = {
        "base": HIER_FAST,
        "spk48": HIER_FAST._replace(speckle_diameter=48),
        "spk32": HIER_FAST._replace(speckle_diameter=32),
        "spk16": HIER_FAST._replace(speckle_diameter=16),
        "cf8": HIER_FAST._replace(coarse_factor=8, speckle_diameter=32),
        "band8": HIER_FAST._replace(
            band=8, granularity=4, speckle_diameter=32
        ),
    }

    def run(hp):
        P = 128 // hp.band
        lb = jnp.asarray(np.stack([left] * P))
        rb = jnp.asarray(np.stack([right] * P))
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p4, hp)
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
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chained(lb, rb))
            dt = (time.perf_counter() - t0) / N
            reps.append(P * H * W / dt / 1e6)
        return agree, reps

    for name, hp in variants.items():
        try:
            agree, reps = run(hp)
            print(
                f"{name:7s} agree={agree:.4f}  mpxs={' '.join(f'{r:.1f}' for r in reps)}",
                flush=True,
            )
        except Exception as e:  # band8 may hit a Mosaic constraint
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
