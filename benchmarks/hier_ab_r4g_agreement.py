"""Round-4 sweep g: DEEP prior pyramid — measured REJECTED.

The r4 stage split (benchmarks/hier_split_r4.py) puts the 1/4-res
coarse at 0.51 ms/frame (16% of the hier8x3 budget — structural: Dc=32
lanes x 1/16 px = 1/4 of the full-res core's lane-pixel work). The
hypothesis: a 1/8-res coarse (Dc=16, ~1/8 the coarse work) could be
bridged by TWO mid levels so each level spans only a 2x resolution gap
(the r4a "c8" rejection bridged 4x directly).

Result (CPU scan backend, 240x512, 3-path full-res):

    base(1lvl)   ramp 0.9807  occl 0.9845  reptex 1.0  bigjump 0.9800  PASS
    deep         ramp 0.9753  occl 0.9853  reptex 1.0  bigjump 0.9684  fail
    deep p4@L1   ramp 0.9808  occl 0.9915  reptex 1.0  bigjump 0.9684  fail
    deep m3@L1   ramp 0.9753  occl 0.9853  reptex 1.0  bigjump 0.9684  fail
    deep lw0@L1  ramp 0.9753  occl 0.9853  reptex 1.0  bigjump 0.9639  fail

bigjump is INVARIANT to every L1 knob (and 4-path L1 improves occl
beyond the one-level base): the failure is not the pyramid chain but
the 1/8-res full-range search itself — the 50-px jump's structure does
not survive 1/8 downsampling, and no downstream band-limited
refinement can recover what the coarse never saw. Matches the r4a
"c8" (0.9683) and r4d "cs2" rejections: the full-precision 1/4-res
4-path coarse is load-bearing. The mid_levels machinery remains
(exactness-tested) for deeper-range configs.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import (
        HIER8_FAST, MidLevel, stereo_sgbm_hier,
    )
    from tests.test_stereo_parity import (
        agreement, occlusion_pair, repeated_texture_pair, synthetic_pair,
    )
    from tests.test_hier import FULL, bigjump_pair, _cv_full

    scenes = {
        "ramp": synthetic_pair(h=240, w=512, max_disp=64, seed=0),
        "occl": occlusion_pair(h=240, w=512, maxd=64, seed=10),
        "reptex": repeated_texture_pair(h=240, w=512, maxd=64, seed=11),
        "bigjump": bigjump_pair(),
    }
    gates = {"ramp": 0.98, "occl": 0.983, "reptex": 0.995, "bigjump": 0.978}
    p = StereoSGBMParams(num_paths=3, **FULL)
    refs = {
        n: _cv_full(StereoSGBMParams(**FULL), l, r)
        for n, (l, r, _) in scenes.items()
    }
    L1 = MidLevel(4, 16, 8, tile=2, margin=4.0, local_window=1, paths=2)
    L2 = MidLevel(2, 8, 4, tile=2, margin=2.5, local_window=1, paths=2)
    DEEP = HIER8_FAST._replace(coarse_factor=8, mid_levels=(L1, L2))
    variants = {
        "base(1lvl)": HIER8_FAST,
        "deep": DEEP,
        "deep p4@L1": DEEP._replace(mid_levels=(L1._replace(paths=4), L2)),
        "deep m3@L1": DEEP._replace(mid_levels=(L1._replace(margin=3.0), L2)),
        "deep lw0@L1": DEEP._replace(mid_levels=(L1._replace(local_window=0), L2)),
    }
    for vname, hp in variants.items():
        ok, line = True, []
        for n, (l, r, _) in scenes.items():
            mine = np.asarray(
                stereo_sgbm_hier(jnp.asarray(l), jnp.asarray(r), p, hp)
            )
            a, e, _ = agreement(mine, refs[n])
            ok &= a >= gates[n]
            line.append(f"{n}={a:.4f}/{e:.3f}")
        print(f"{vname:14s} {' '.join(line)}  {'PASS' if ok else 'fail'}", flush=True)


if __name__ == "__main__":
    main()
