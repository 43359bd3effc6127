"""Agreement sweep: tile=2 (entry-only realign) and coarse_paths=3.

Two config hypotheses against the hier16x3 headline preset (tile=1,
local_window=1, coarse_paths=4, num_paths=3):

1. tile=2 doubles the shift-map tile to 8 full-res px, which removes the
   mid-block carry realignment from ALL THREE scan kernels (tile_px=8 is
   the entry-only path in banded_reduce_pack) and halves the delta-row
   traffic. r3a measured tile=2/lw=0 at 0.9761 on the occlusion scene —
   the question is whether lw=1/2 (wider coarse min/max pooling) buys
   the agreement back the way lw=1 did for tile=1.
2. coarse_paths=3 drops the R->L scan from the two coarse sub-packs.
   The 2-path coarse was rejected (band placement needs the
   horizontally-smoothed prior); 3 keeps L->R.

CPU scan backend, 4 adversarial scenes; gate = the tests/test_hier.py
3-path pins (ramp 0.98 / occl 0.983 / reptex 0.995 / bigjump 0.978).
Chip A/B only for variants that pass.
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

    variants = {
        "base(t1,lw1,cp4)": HIER_FAST,
        "t2,lw1": HIER_FAST._replace(tile=2),
        "t2,lw2": HIER_FAST._replace(tile=2, local_window=2),
        "t1,lw1,cp3": HIER_FAST._replace(coarse_paths=3),
        "t2,lw2,cp3": HIER_FAST._replace(tile=2, local_window=2, coarse_paths=3),
    }

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
        print(f"{vname:18s} {' '.join(line)}  {'PASS' if ok else 'fail'}", flush=True)


if __name__ == "__main__":
    main()
