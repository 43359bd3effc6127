"""Capture a jax.profiler trace of hier16x3 pack dispatches on the TPU.

Writes the xplane to /tmp/hier_trace; benchmarks/trace_report.py turns
it into a per-op table. If the remote-TPU tunnel cannot deliver device
traces, the xplane will only contain host lanes — the report says so.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, D
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import (
        HIER4_FAST,
        HIER8_FAST,
        HIER_FAST,
        stereo_sgbm_hier_batch,
    )

    mode = sys.argv[1] if len(sys.argv) > 1 else "hier16"
    HP = {"hier16": HIER_FAST, "hier8": HIER8_FAST, "hier4": HIER4_FAST}[mode]

    left, right = _scene()
    P = 128 // HP.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))
    p = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=3,
    )
    fn = jax.jit(lambda l, r: stereo_sgbm_hier_batch(l, r, p, HP))
    # compile + warm
    np.asarray(fn(lb, rb))
    with jax.profiler.trace("/tmp/hier_trace"):
        for i in range(3):
            out = fn(lb.at[:, 0, 0].set(i), rb)
        np.asarray(out)
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
