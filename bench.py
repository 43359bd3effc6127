"""Headline benchmark: SGBM disparity throughput (Mpx/s/chip, D=128).

Per /root/repo/BASELINE.json: StereoSGBM 8-path on a 1280x720 pair,
D=128 with subpixel + uniqueness, target >= 500 Mpx/s/chip. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPXS = 500.0
H, W, D = 720, 1280, 128
BATCH = 1
WARMUP = 2
ITERS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm

    params = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10, disp12_max_diff=1
    )

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W + 2 * D)).astype(np.int32)
    left = jnp.asarray(np.stack([base[:, D : D + W]] * BATCH))
    right = jnp.asarray(np.stack([base[:, D - 20 : D - 20 + W]] * BATCH))

    fn = jax.jit(jax.vmap(lambda l, r: stereo_sgbm(l, r, params)))

    for _ in range(WARMUP):
        jax.block_until_ready(fn(left, right))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(left, right)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mpx = H * W * BATCH * ITERS / dt / 1e6
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
