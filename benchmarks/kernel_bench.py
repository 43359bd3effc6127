"""Per-stage SGBM kernel timings on the current backend (run on TPU).

Times each stage of the 720p/D=128 headline config independently with
the chained-jit method (utils/profiling.time_jitted), so perf work
starts from a measured split, not guesses.

Usage: python benchmarks/kernel_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

H, W, D = 720, 1280, 128


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="N=3 iterations")
    ap.add_argument("--stages", default="", help="comma list to restrict")
    args = ap.parse_args()
    n = 3 if args.quick else 5

    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import (
        StereoSGBMParams,
        _xsobel_clipped,
        stereo_sgbm,
    )
    from stereo_vision_tpu.stereo.cost_pallas import cost_volume_pallas
    from stereo_vision_tpu.stereo.sgm_pallas import sgm_reduce_pallas
    from stereo_vision_tpu.stereo.postprocess import speckle_filter
    from stereo_vision_tpu.utils.profiling import time_jitted

    params = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10, disp12_max_diff=1
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W + 2 * D)).astype(np.int32)
    left = jnp.asarray(base[:, D : D + W])
    # Disparity convention: left[x] matches right[x - d] — right content
    # shifted LEFT, so right samples base 20 columns to the RIGHT of
    # left's window (d = +20, inside [0, D)). Same fixture as bench.py;
    # the inverted shift would make every full-pipeline output invalid
    # and feed time_jitted a constant carry (the DCE hazard its
    # docstring warns about).
    right = jnp.asarray(base[:, D + 20 : D + 20 + W])
    ftz = params.ftzero

    def cost_fn(l, r):
        return cost_volume_pallas(
            _xsobel_clipped(l, ftz), _xsobel_clipped(r, ftz),
            l.astype(jnp.int32), r.astype(jnp.int32),
            ndisp=D, block_size=params.block_size, x_offset=D,
        )

    C = jax.jit(cost_fn)(left, right)
    C = jax.block_until_ready(C)

    disp_f = rng.integers(20, 90, (H, W)).astype(np.float32)
    disp_f[rng.random((H, W)) < 0.3] = -1.0
    disp_j = jnp.asarray(disp_f)

    stages = {
        "cost_kernel": lambda: time_jitted(cost_fn, (left, right), n=n),
        "sgm_reduce_8path": lambda: time_jitted(
            lambda c: sgm_reduce_pallas(c, params.P1, params.P2, 10, num_paths=8),
            (C,), n=n,
        ),
        "sgm_reduce_4path": lambda: time_jitted(
            lambda c: sgm_reduce_pallas(c, params.P1, params.P2, 10, num_paths=4),
            (C,), n=n,
        ),
        "speckle_s100": lambda: time_jitted(
            lambda d: speckle_filter(d, 2.0, 100, -1.0), (disp_j,), n=n
        ),
        "full_sgbm": lambda: time_jitted(
            lambda l, r: stereo_sgbm(l, r, params), (left, right), n=n
        ),
        "full_sgbm_speckle": lambda: time_jitted(
            lambda l, r: stereo_sgbm(
                l, r, params._replace(speckle_window_size=100, speckle_range=2)
            ),
            (left, right), n=n,
        ),
    }
    pick = [s.strip() for s in args.stages.split(",") if s.strip()]
    out = {}
    for name, fn in stages.items():
        if pick and name not in pick:
            continue
        dt = fn()
        out[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    out["mpx_s_full"] = round(H * W / (out.get("full_sgbm_speckle", out.get("full_sgbm", 1e9)) / 1e3) / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
