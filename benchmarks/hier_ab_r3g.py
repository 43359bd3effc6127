"""r3g A/B: fused Pallas box downsample for the hier coarse pyramid
(bit-identical to the MXU-matmul _downsample_box; exactness pinned by
TestDownsamplePack — this measures speed only):

  dsmm     — XLA dot_general downsample (previous default; measured
             0.567 ms/frame, half the coarse+shift stage)
  dspallas — fused Pallas kernel (row sums + 0/1 pool contraction per
             8-row block, one pass over the raw images)

Both arms run with the r3f defaults (valid trim on, per-frame coarse
assemble). Run alone on the chip; redirect output to a file.
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
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier_batch

    p4 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        num_paths=4,
    )
    left, right = _scene()
    P = 128 // HIER_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    def run(ds_flag):
        hier._DS_PALLAS = ds_flag
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p4, HIER_FAST)

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

    for name, flag in (("dsmm", False), ("dspallas", True)):
        try:
            reps = run(flag)
            print(f"{name:8s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
