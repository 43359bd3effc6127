"""Agreement A/B: vertical-only (num_paths=2) banded full-res pass.

Hypothesis: the coarse prior already carries the global structure, so
the full-res refinement confined to a 16-lane band might survive losing
the two horizontal SGM paths (saving 2 of 4 direction volumes + both
horizontal scan kernels, ~0.6-0.9 ms of the 4.9 ms/frame headline).

Runs the FOUR adversarial scenes + the bench scene on CPU (scan
backend) at num_paths 4 vs 2 with the HIER_FAST preset; prints
agreement / EPE vs cv2 full-D. Gate: every scene must stay above its
tests/test_hier.py pin (0.98 / 0.983 / 0.995 / 0.978) for the 2-path
variant to be considered at all.
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

    for paths in (4, 3, 2):
        p = StereoSGBMParams(num_paths=paths, **FULL)
        p_ref = StereoSGBMParams(**FULL)
        for name, (left, right, _) in scenes.items():
            ref = _cv_full(p_ref, left, right)
            mine = np.asarray(
                stereo_sgbm_hier(jnp.asarray(left), jnp.asarray(right), p, HIER_FAST)
            )
            agree, epe, overlap = agreement(mine, ref)
            print(
                f"paths={paths} {name:8s} agree={agree:.4f} epe={epe:.3f}"
                f" overlap={overlap:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
