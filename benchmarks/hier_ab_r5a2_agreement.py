"""Round-5 sweep a2: margin-buying around the passing band-4 config.

r5a found exactly one kernel-feasible pass: band4/G1/m1.0 (4-px tiles
at mid and full). Its margins over the bars are thin (occl +0.0001,
ramp +0.0002, bigjump +0.0006). This sweep searches the neighborhood
for a config with healthier margins, restricted to geometries the
packed kernels support (every level's shift tile 4 px or 8k px).

r5a signal directions: mid_tile=1 improved occl (+0.002) but is 2-px
mid geometry (scan-only) — instead try mid_local_window=2 (wider mid
pooling, same effect direction, kernel-free); tile=1 improved
ramp/bigjump but lost occl (scan-only anyway); midp4 was ~neutral.
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

    g1 = HIER8_FAST._replace(band=4, granularity=1, margin=1.0)
    variants = {
        "G1 m0.75": g1._replace(margin=0.75),
        "G1 m1.25": g1._replace(margin=1.25),
        "G1 m1.0 mlw2": g1._replace(mid_local_window=2),
        "G1 m1.0 lw2": g1._replace(local_window=2),
        "G1 m1.0 midp4": g1._replace(mid_paths=4),
        "G1 m1.0 mm2.0": g1._replace(mid_margin=2.0),
        "G1 m1.0 mm3.0": g1._replace(mid_margin=3.0),
        "G1 m1.0 sp6": g1._replace(speckle_diameter=6),
        "G1 m1.0 wm2": g1._replace(wide_margin=2.0),
        "G1 m0.75 mlw2": g1._replace(margin=0.75, mid_local_window=2),
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
