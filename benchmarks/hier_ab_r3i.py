"""r3i A/B: full-res path count in the hier16 headline mode.

  p4 — vertical pair + both horizontals (previous default)
  p3 — vertical pair + L->R only (1 fewer scan kernel + volume)
  p2 — vertical pair only      (2 fewer scan kernels + volumes)

Agreement on the adversarial scenes (benchmarks/paths2_agreement.py,
CPU): p4 0.9817-1.0, p3 0.9804-1.0, p2 0.9797-1.0 — all above the
tests/test_hier.py pins, margins thin on ramp/bigjump. This measures
the speed side. Pallas-vs-scan exactness for every path count is pinned
by TestReducePack. Run alone on the chip; redirect output to a file.
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

    def run(paths):
        p = StereoSGBMParams(
            num_disparities=D, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
            num_paths=paths,
        )
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

    for paths in (4, 3, 2):
        try:
            reps = run(paths)
            print(f"p{paths} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"p{paths} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
