"""Round-4 sweep d: cheaper COARSE/MID stages under the two-level prior.

The r4b chip split shows the band-8 full-res core is no longer the
frame budget's majority — the prior stack (coarse + mid) is a sizable
slice. Levers, each previously rejected for DIRECT band-16 placement
but untested as input to the more forgiving two-level chain:

  - coarse_stride=2: Kc=16 coarse lanes -> ONE 8-frame coarse pack
    instead of four 4-frame packs (full spatial precision, subpixel
    interpolates the strided samples; r3b rejected it for direct
    placement at ramp 0.970/bigjump 0.967).
  - mid_paths=3/2: the mid is only a prior; does it need R->L (or any
    horizontal) smoothing when the coarse it refines had all four?
  - mid_band=8/G4: one 16-frame mid pack instead of two 8-frame packs.

Gate: the four pins (ramp 0.98 / occl 0.983 / reptex 0.995 / bigjump
0.978). CPU scan backend; chip A/B only for passing variants.
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
    variants = {
        "base": B8,
        "cs2": B8._replace(coarse_stride=2),
        "midp3": B8._replace(mid_paths=3),
        "midp2": B8._replace(mid_paths=2),
        "midb8": B8._replace(mid_band=8, mid_granularity=4, mid_margin=2.0),
        "cs2 midp3": B8._replace(coarse_stride=2, mid_paths=3),
        "cs2 midp3 midb8": B8._replace(
            coarse_stride=2, mid_paths=3, mid_band=8, mid_granularity=4,
            mid_margin=2.0,
        ),
        "midp2+midb8": B8._replace(
            mid_paths=2, mid_band=8, mid_granularity=4, mid_margin=2.0,
        ),
        "midp2+midb8 mm2.5": B8._replace(
            mid_paths=2, mid_band=8, mid_granularity=4, mid_margin=2.5,
        ),
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
        print(f"{vname:16s} {' '.join(line)}  {'PASS' if ok else 'fail'}", flush=True)


if __name__ == "__main__":
    main()
