"""Adversarial-scene agreement for HIER_FAST with coarse LR OFF.

On the bench scene, coarse_lr=-1 measured FASTER (178.0 vs 174.0 Mpx/s)
AND slightly higher agreement (0.9954 vs 0.9948) than the shipped
preset (benchmarks/hier_ab_r3d.py, 2026-08-18). This script decides
adoption: the preset changes ONLY if every adversarial scene stays at
or above the tests/test_hier.py::TestHierFastAgreement pins.

CPU run (scan backend, like the tests): python benchmarks/coarse_lr_agreement.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import HIER_FAST, stereo_sgbm_hier
    from tests.test_hier import FULL, _cv_full, bigjump_pair
    from tests.test_stereo_parity import (
        agreement,
        occlusion_pair,
        repeated_texture_pair,
        synthetic_pair,
    )

    scenes = {
        "ramp_box": (synthetic_pair(h=240, w=512, max_disp=64, seed=0), 0.98),
        "occlusion": (occlusion_pair(h=240, w=512, maxd=64, seed=10), 0.983),
        "repeated": (repeated_texture_pair(h=240, w=512, maxd=64, seed=11), 0.995),
        "big_jump": (bigjump_pair(), 0.978),
    }
    p = StereoSGBMParams(**FULL)
    for name, (pair, pin) in scenes.items():
        left, right, _ = pair
        ref = _cv_full(p, left, right)
        row = [name]
        for label, hp in (
            ("base", HIER_FAST),
            ("noclr", HIER_FAST._replace(coarse_lr=-1)),
        ):
            mine = np.asarray(
                stereo_sgbm_hier(jnp.asarray(left), jnp.asarray(right), p, hp)
            )
            agree, epe, _ = agreement(mine, ref)
            row.append(f"{label}={agree:.4f}/epe{epe:.3f}")
        row.append(f"pin={pin}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
