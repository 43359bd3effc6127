"""Headline benchmark: SGBM disparity throughput (Mpx/s/chip, D=128).

Per /root/repo/BASELINE.json config #2: StereoSGBM 8-path on a 1280x720
pair, D=128 with subpixel + uniqueness + LR check + SPECKLE FILTER
(window 100, range 2), target >= 500 Mpx/s/chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: N chained runs inside one jit dispatch (each iteration's
input depends on the previous output), materialized at the end — immune
to async-dispatch undercounting and value-keyed result caching in the
remote-TPU tunnel.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPXS = 500.0
H, W, D = 720, 1280, 128
N = 5
B = 4  # frames per dispatch: batch=4 measured +18% throughput over
       # batch=1 (40.5 vs 34.4 Mpx/s) once int16 C halved volume memory
       # (batch=4 OOM'd in round 1). Metric is throughput per chip;
       # per-frame latency is batch=1 (see benchmarks/kernel_bench.py).


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm

    params = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10, disp12_max_diff=1,
        speckle_window_size=100, speckle_range=2,
    )

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (B, H, W + 2 * D)).astype(np.int32)
    left = jnp.asarray(base[:, :, D : D + W])
    right = jnp.asarray(base[:, :, D + 20 : D + 20 + W])

    @jax.jit
    def chained(l, r):
        def body(carry, i):
            li = l.at[0, 0, 0].set(carry + i)
            d = jax.vmap(lambda a, b: stereo_sgbm(a, b, params))(li, r)
            # Carry touches EVERY batch element so no frame's computation
            # is dead code (d[0] alone would let XLA skip frames 1..B-1).
            return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
        return c

    _ = np.asarray(chained(left, right))  # compile + first run
    t0 = time.perf_counter()
    _ = np.asarray(chained(left, right))
    dt = (time.perf_counter() - t0) / N

    mpx = B * H * W / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "sgbm_disparity_throughput_d128_720p",
                "value": round(mpx, 2),
                "unit": "Mpx/s/chip",
                "vs_baseline": round(mpx / BASELINE_MPXS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
