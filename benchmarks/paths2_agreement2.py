"""Round 2 of the path-count quality search (CPU scan backend).

Variants on the four adversarial scenes vs cv2 full-D:
  p3           — vertical pair + L->R (the 201.6 Mpx/s arm of r3i)
  p2-s1.5/s2.0 — vertical-only with P1/P2 scaled 1.5x / 2x (does extra
                 per-path smoothing recover the lost horizontal paths?)
  p3-c2        — p3 with a 2-path COARSE pass (prior only needs +-G)
Gate: every scene >= 0.98 within-1px (the BASELINE bar, applied
per-scene) for a variant to carry the headline.
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

    base = StereoSGBMParams(**FULL)
    variants = {
        "p3": (base._replace(num_paths=3), HIER_FAST),
        "p2-s1.5": (
            base._replace(
                num_paths=2,
                p1=int(base.P1 * 1.5), p2=int(base.P2 * 1.5),
            ),
            HIER_FAST,
        ),
        "p2-s2.0": (
            base._replace(num_paths=2, p1=base.P1 * 2, p2=base.P2 * 2),
            HIER_FAST,
        ),
        "p3-c2": (
            base._replace(num_paths=3),
            HIER_FAST._replace(coarse_paths=2),
        ),
    }

    p_ref = base
    refs = {
        name: _cv_full(p_ref, left, right)
        for name, (left, right, _) in scenes.items()
    }
    for vname, (p, hp) in variants.items():
        for name, (left, right, _) in scenes.items():
            mine = np.asarray(
                stereo_sgbm_hier(jnp.asarray(left), jnp.asarray(right), p, hp)
            )
            agree, epe, overlap = agreement(mine, refs[name])
            print(
                f"{vname:8s} {name:8s} agree={agree:.4f} epe={epe:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
