"""A/B on the real TPU: hier16 assemble-LR backend + tighter speckle cap.

  base   — shipped HIER_FAST (speckle_diameter 16, scan LR)
  lrpal  — LR check via the fused Pallas kernel (stereo/lr_pallas.py)
  spk8   — speckle_diameter 8
  both   — spk8 + lrpal
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
        speckle_window_size=100, speckle_range=2, num_paths=4,
    )
    p_scan = StereoSGBMParams(**base)
    p_pal = StereoSGBMParams(backend="pallas", **base)

    left, right = _scene()
    print("computing exact8 reference...", flush=True)
    ref = np.asarray(
        jax.jit(
            lambda l, r: stereo_sgbm(l, r, StereoSGBMParams(
                num_disparities=D, block_size=5, uniqueness_ratio=10,
                disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
            ))
        )(jnp.asarray(left), jnp.asarray(right))
    )

    variants = {
        "base": (p_scan, HIER_FAST),
        "lrpal": (p_pal, HIER_FAST),
        "spk8": (p_scan, HIER_FAST._replace(speckle_diameter=8)),
        "both": (p_pal, HIER_FAST._replace(speckle_diameter=8)),
    }

    P = 128 // HIER_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    def run(p, hp):
        fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p, hp)
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

    for name, (p, hp) in variants.items():
        try:
            agree, reps = run(p, hp)
            print(
                f"{name:6s} agree={agree:.4f}  mpxs={' '.join(f'{r:.1f}' for r in reps)}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:6s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
