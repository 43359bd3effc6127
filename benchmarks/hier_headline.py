"""Time the current default hier16x3 headline config (bench.py mode) alone.

4 chained-jit reps on the real chip — the quick A/B instrument for
kernel changes (full bench.py recompiles all five modes, ~10 min).
Run alone on an idle chip; redirect output to a file.
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

    p = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
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
    for _i in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb, rb))
        dt = (time.perf_counter() - t0) / N
        print(f"hier16x3 {P * H * W / dt / 1e6:.1f} Mpx/s", flush=True)


if __name__ == "__main__":
    main()
