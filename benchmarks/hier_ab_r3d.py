"""A/B on the real TPU: where do assemble (1.95 ms/frame) and coarse
(1.19 ms/frame) go? (hier_split_bench 2026-08-18 split of the 173.8
Mpx/s hier16 headline.)

  base    — shipped headline (HIER_FAST, auto backend = Pallas LR at the
            full-res assemble — REAL this time: the r3b A/B ran scan in
            both arms because _LR_PALLAS silently overrode the explicit
            backend="pallas" request inside lr_fail)
  lrscan  — full-res assemble LR via the XLA static-shift chains
  nolr    — full-res LR check OFF (disp12_max_diff=-1): COST PROBE ONLY
            (agreement drops by construction; the delta vs base is the
            full-range LR + its glue, x8 frames)
  noclr   — coarse LR OFF (coarse_lr=-1): coarse scan-LR cost + the
            prior-quality effect on agreement (fill_invalid has nothing
            to fill, so most of its 12 rounds also fold to no-ops)
  clrpal  — coarse assemble LR through the Pallas kernel instead of the
            hardcoded scan chains (hier._COARSE_LR_BACKEND patch)
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
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier_batch

    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        speckle_window_size=100, speckle_range=2, num_paths=4,
    )
    p = StereoSGBMParams(disp12_max_diff=1, **base)
    p_nolr = StereoSGBMParams(disp12_max_diff=-1, **base)
    p_scan = StereoSGBMParams(disp12_max_diff=1, backend="scan", **base)

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
        "base": (p, HIER_FAST, None),
        "lrscan": (p_scan, HIER_FAST, None),
        "nolr": (p_nolr, HIER_FAST, None),
        "noclr": (p, HIER_FAST._replace(coarse_lr=-1), None),
        "clrpal": (p, HIER_FAST, "pallas"),
    }

    P = 128 // HIER_FAST.band
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    def run(pp, hp, coarse_backend):
        old = hier._COARSE_LR_BACKEND
        if coarse_backend is not None:
            hier._COARSE_LR_BACKEND = coarse_backend
        try:
            fn = lambda l, r: stereo_sgbm_hier_batch(l, r, pp, hp)
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
        finally:
            hier._COARSE_LR_BACKEND = old

    for name, (pp, hp, cb) in variants.items():
        try:
            agree, reps = run(pp, hp, cb)
            print(
                f"{name:7s} agree={agree:.4f}  mpxs={' '.join(f'{r:.1f}' for r in reps)}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
