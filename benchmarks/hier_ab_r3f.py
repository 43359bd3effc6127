"""r3f A/B: two more glue eliminations on the hier16 headline (both are
bit-identical to the previous defaults — exactness covered by the pack-
vs-scan suite — this measures speed only):

  alloff  — previous state (full-width pix/box + XLA valid slice;
            per-frame coarse assemble)
  trimon  — valid-region trim: pix emits x >= min_x - 8, box crops to
            min_x in-kernel (no XLA slice pass over the cost volume)
  coarseon— coarse assemble row-stacked (pack_c frames -> ONE chain;
            coarse maps are pass-overhead bound, not chain bound)
  both    — both on (the proposed default)

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
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo import banded_pallas
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

    variants = {
        "alloff": (False, False),
        "trimon": (True, False),
        "coarseon": (False, True),
        "both": (True, True),
    }

    def run(trim_flag, coarse_flag):
        banded_pallas._TRIM_VALID = trim_flag
        hier._COARSE_PACK_ASSEMBLE = coarse_flag
        banded_pallas.banded_pixel_cost_pack.clear_cache()
        banded_pallas.aligned_box_packed.clear_cache()
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

    for name, (tf, cf) in variants.items():
        try:
            reps = run(tf, cf)
            print(f"{name:8s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
