"""Round-5 sweep a: band-4 full-res under the two-level prior (verdict-r4 #1).

The band-halving ladder won rounds 3 (32->16) and 4 (16->8, by inserting
the 1/2-res mid level). One rung remains: band 4 (32 frames per 128-lane
pack, G=2). The band-proportional kernel buckets (reduce 0.84 + pix 0.57
+ box 0.40 = 1.81 of 3.06 ms/frame, roofline "Round 4g") are the only
budget slice big enough for a round-sized win; a clean band-4 landing
projects ~380-400 Mpx/s.

Feasibility math: the full-res prior is the 1/2-res mid disparity
doubled, so its error is 2x the mid's subpixel error plus the 4-px tile
pooling. Band 4 at G=2 guarantees only B - G = 2 usable lanes around a
flat prior. This sweep measures whether ANY (margin, G, tile, mid
tightening) combination holds the four adversarial pins; tile=1 rows
(2-px full-res tiles, scan-only geometry) diagnose whether failures are
placement-resolution-limited (Pallas kernels need 4-px tiles, so a
tile=1-only pass would demand new kernel geometry before paying off).

Gate: ramp 0.98 / occl 0.983 / reptex 0.995 / bigjump 0.978 (the
HIER8_FAST bars). CPU scan backend; chip A/B only for passing variants.
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
    from stereo_vision_tpu.stereo.hier import HIER8_FAST, stereo_sgbm_hier
    from tests.test_stereo_parity import (
        agreement,
        occlusion_pair,
        repeated_texture_pair,
        synthetic_pair,
    )
    from tests.test_hier import FULL, bigjump_pair, _cv_full

    scenes = {
        "ramp": synthetic_pair(h=240, w=512, max_disp=64, seed=0),
        "occl": occlusion_pair(h=240, w=512, maxd=64, seed=10),
        "reptex": repeated_texture_pair(h=240, w=512, maxd=64, seed=11),
        "bigjump": bigjump_pair(),
    }
    gates = {"ramp": 0.98, "occl": 0.983, "reptex": 0.995, "bigjump": 0.978}

    B8 = HIER8_FAST
    # band 4 rungs. Full-res tile side = mid_factor * tile = 2 * tile.
    b4 = B8._replace(band=4, granularity=2)
    variants = {
        "base8": B8,
        # margin ladder at the production tile geometry (4-px tiles)
        "b4 m0.5": b4._replace(margin=0.5),
        "b4 m1.0": b4._replace(margin=1.0),
        "b4 m1.5": b4._replace(margin=1.5),
        # finer placement grid
        "b4 G1 m1.0": b4._replace(granularity=1, margin=1.0),
        # tighter mid prior: mid at 2-px tiles (mid_tile=1 -> (4/2)*1=2px,
        # scan-only geometry) and/or wider mid pooling
        "b4 m1.0 mt1": b4._replace(margin=1.0, mid_tile=1),
        "b4 m1.0 mm1.5": b4._replace(margin=1.0, mid_margin=1.5),
        # 2-px full-res tiles (tile=1, scan-only): placement-resolution
        # diagnosis
        "b4 m1.0 t1": b4._replace(margin=1.0, tile=1),
        "b4 m0.5 t1": b4._replace(margin=0.5, tile=1),
        "b4 G1 m1.0 t1": b4._replace(granularity=1, margin=1.0, tile=1),
        # mid with 3 full-res-style paths was falsified for band 8; the
        # band-4 full-res may want a SHARPER mid (band 16 mid, 4-path)
        "b4 m1.0 midb16": b4._replace(
            margin=1.0, mid_band=16, mid_granularity=8, mid_margin=2.5,
            mid_paths=2,
        ),
        "b4 m1.0 midp4": b4._replace(margin=1.0, mid_paths=4),
    }
    if len(sys.argv) > 1:
        variants = {k: v for k, v in variants.items() if sys.argv[1] in k}

    p = StereoSGBMParams(num_paths=3, **FULL)
    p_ref = StereoSGBMParams(**FULL)
    refs = {
        name: _cv_full(p_ref, left, right)
        for name, (left, right, _) in scenes.items()
    }
    for vname, hp in variants.items():
        ok = True
        line = []
        for name, (left, right, _) in scenes.items():
            try:
                mine = np.asarray(
                    stereo_sgbm_hier(jnp.asarray(left), jnp.asarray(right), p, hp)
                )
            except Exception as e:
                line.append(f"{name}=ERR:{type(e).__name__}")
                ok = False
                continue
            agree, epe, _ = agreement(mine, refs[name])
            ok &= agree >= gates[name]
            line.append(f"{name}={agree:.4f}/{epe:.3f}")
        print(f"{vname:18s} {' '.join(line)}  {'PASS' if ok else 'fail'}", flush=True)


if __name__ == "__main__":
    main()
