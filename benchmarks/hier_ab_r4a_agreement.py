"""Round-4 sweep: band-8 full-res refinement under a two-level prior.

Verdict-r3 #1: every band-proportional kernel cost halves again at
band 8 (16 frames per 128-lane pack), but the r3b single-level attempt
measured 0.71 agreement — the 1/4-res coarse prior is not tight enough
for an 8-lane band. The untested fix: a MID level (1/2 res, band 16,
fed by the existing coarse) tightens the prior to ~+-2 full-res
disparities before the band-8 full-res pass (hier.HierParams.mid_*).

CPU scan backend, 4 adversarial scenes at 240x512; gate = the
tests/test_hier.py 3-path pins (ramp 0.98 / occl 0.983 / reptex 0.995 /
bigjump 0.978). Chip A/B only for variants that pass all four.
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
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier
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

    # Two-level band-8 base: full tile side = mid_factor*tile = 4 px,
    # mid tile side = (coarse_factor//mid_factor)*mid_tile = 4 px (both
    # Pallas-legal). local_window=1 at MID res pools +-2 full px.
    B8 = HIER_FAST._replace(
        band=8, granularity=4, tile=2, margin=2.0, local_window=1,
        mid_factor=2, mid_band=16, mid_granularity=8, mid_tile=2,
        mid_margin=4.0, mid_local_window=1,
    )
    variants = {
        "b8 m2.0 lw1": B8,
        "b8 m1.5 lw1": B8._replace(margin=1.5),
        "b8 m2.5 lw1": B8._replace(margin=2.5),
        "b8 m2.0 lw2": B8._replace(local_window=2),
        "b8 m2.0 lw0": B8._replace(local_window=0),
        "b8 t4 m2.0": B8._replace(tile=4),
        "b8 midm3": B8._replace(mid_margin=3.0),
        "b8 midm5": B8._replace(mid_margin=5.0),
        "b8 midlw0": B8._replace(mid_local_window=0),
        "b16+mid (ctrl)": HIER_FAST._replace(
            mid_factor=2, mid_band=16, mid_granularity=8, mid_tile=2,
            mid_margin=4.0, mid_local_window=1, tile=2,
        ),
        # coarse_factor=8 under the two-level prior: rejected in r3b for
        # DIRECT band-16 placement (0.9893 bench), but the mid band has
        # far more slack than the full-res band — and Dc=16 halves the
        # coarse sub-pack count (2 calls instead of 4 at P=16).
        "b8 c8": B8._replace(margin=1.5, coarse_factor=8),
        "b8 c8 midm5": B8._replace(margin=1.5, coarse_factor=8, mid_margin=5.0),
        "b8 c8 midlw2": B8._replace(
            margin=1.5, coarse_factor=8, mid_local_window=2
        ),
        "b8 m1.5 wm2": B8._replace(margin=1.5, wide_margin=2.0),
        "b8 m2.0 wm2": B8._replace(wide_margin=2.0),
        "b8 m2.0 wm4": B8._replace(wide_margin=4.0),
        "b8 m1.5 midwm4": B8._replace(margin=1.5, mid_margin=4.0, wide_margin=2.0),
    }
    if len(sys.argv) > 1:  # substring filter
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
            mine = np.asarray(
                stereo_sgbm_hier(jnp.asarray(left), jnp.asarray(right), p, hp)
            )
            agree, epe, _ = agreement(mine, refs[name])
            ok &= agree >= gates[name]
            line.append(f"{name}={agree:.4f}/{epe:.3f}")
        print(f"{vname:16s} {' '.join(line)}  {'PASS' if ok else 'fail'}", flush=True)


if __name__ == "__main__":
    main()
