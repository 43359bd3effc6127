"""Imperfect-rectification robustness (round-4 verdict item #5).

The reference's best real calibration leaves 0.73 px RMS reprojection
error (/root/reference/stereo_calibration/project-updates/
project_update5.19.25.md:36), so a real rig feeds the matcher pairs
with 0.2-1.0 px of residual vertical misalignment and a little roll.
The rendered parity scenes are perfectly rectified — this harness
applies calibrated perturbations to the RIGHT view (vertical shift dy,
roll theta about the image center, bilinear resample) and measures, on
the SAME distorted inputs:

  - cv2.StereoSGBM MODE_HH full-D (the behavior reference),
  - our exact8 (bit-exact mode),
  - hier16x3 and hier8x3 (the banded headline modes),

reporting each jax mode's agreement vs cv2 *on the distorted pair* and
every engine's within-1px accuracy vs the scene's ground truth. The
question the table answers: does the banded prior degrade FASTER than
cv2/exact8 as rectification error grows (it must not), or does it help?

CPU scan backend, 240x512 scenes. Output: a markdown table on stdout
(pasted into docs/rect_robustness.md).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")


def _perturb(img: np.ndarray, dy: float, roll_deg: float) -> np.ndarray:
    """Vertical shift + roll about the center, bilinear, replicate border."""
    import cv2

    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), roll_deg, 1.0)
    M[1, 2] += dy
    return cv2.warpAffine(
        img.astype(np.float32), M, (w, h),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE,
    ).round().astype(np.uint8)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
    from stereo_vision_tpu.stereo.hier import (
        HIER_FAST, HIER8_FAST, stereo_sgbm_hier,
    )
    from tests.test_stereo_parity import (
        agreement, occlusion_pair, synthetic_pair,
    )
    from tests.test_hier import FULL, bigjump_pair, _cv_full

    scenes = {
        "ramp": synthetic_pair(h=240, w=512, max_disp=64, seed=0),
        "occl": occlusion_pair(h=240, w=512, maxd=64, seed=10),
        "bigjump": bigjump_pair(),
    }
    perturbs = [  # (label, dy px, roll deg) — 0.73 px RMS real-rig world
        ("clean", 0.0, 0.0),
        ("dy0.2", 0.2, 0.0),
        ("dy0.5", 0.5, 0.0),
        ("dy1.0", 1.0, 0.0),
        ("dy0.5+roll0.1", 0.5, 0.1),
    ]
    p8 = StereoSGBMParams(**FULL)
    p3 = StereoSGBMParams(num_paths=3, **FULL)

    engines = {
        "exact8": lambda l, r: np.asarray(
            stereo_sgbm(jnp.asarray(l.astype(np.int32)), jnp.asarray(r.astype(np.int32)), p8)
        ),
        "hier16x3": lambda l, r: np.asarray(
            stereo_sgbm_hier(jnp.asarray(l.astype(np.int32)), jnp.asarray(r.astype(np.int32)), p3, HIER_FAST)
        ),
        "hier8x3": lambda l, r: np.asarray(
            stereo_sgbm_hier(jnp.asarray(l.astype(np.int32)), jnp.asarray(r.astype(np.int32)), p3, HIER8_FAST)
        ),
    }

    def gt_acc(disp, gt):
        """within-1px fraction on pixels the engine marked valid (x>=D)."""
        d = disp.astype(np.float32)
        if d.dtype == np.int16 or d.max() > 300:  # cv2 fixed-point
            d = d / 16.0
        v = d > -1
        v[:, :128] = False
        if not v.any():
            return 0.0
        return float((np.abs(d - gt)[v] <= 1.0).mean())

    print("| scene | perturb | cv2 vs GT | " + " | ".join(
        f"{e} vs cv2 / vs GT" for e in engines) + " |")
    print("|---" * (3 + len(engines)) + "|")
    for sname, (left, right, gt) in scenes.items():
        for label, dy, roll in perturbs:
            rp = _perturb(right, dy, roll)
            ref = _cv_full(p8, left, rp)
            refd = ref.astype(np.float32) / 16.0
            cols = [f"{gt_acc(refd, gt):.4f}"]
            for ename, fn in engines.items():
                out = fn(left, rp)
                agr, _, _ = agreement(out, ref)
                cols.append(f"{agr:.4f} / {gt_acc(out, gt):.4f}")
            print(f"| {sname} | {label} | " + " | ".join(cols) + " |", flush=True)


if __name__ == "__main__":
    main()
