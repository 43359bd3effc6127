"""Pinned behavioral signature of cv2 5.0's StereoSGBM (docs/cv2_parity_notes.md).

These tests encode the root-cause findings of the bit-exactness
investigation. If an OpenCV upgrade changes this signature, parity
expectations must be revisited.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _sgbm(bs=1, p1=2, p2=5, D=16):
    return cv2.StereoSGBM.create(
        minDisparity=0, numDisparities=D, blockSize=bs, P1=p1, P2=p2,
        disp12MaxDiff=-1, uniquenessRatio=0, speckleWindowSize=0,
        mode=cv2.STEREO_SGBM_MODE_HH,
    )


def _impulse_scene(H=16, W=128, x0=60, shift=5, single_row=None):
    left = np.full((H, W), 100, np.uint8)
    right = np.full((H, W), 100, np.uint8)
    rows = range(H) if single_row is None else [single_row]
    for y in rows:
        left[y, x0] = 200
        right[y, x0 - shift] = 200
    return left, right


def test_zero_penalties_are_not_pure_wta():
    """cv2 substitutes P1=2/P2=max(5,P1+1) for zeros: flat all-tie pixels
    inherit the impulse-seeded disparity instead of d=0 (first minimum)."""
    left, right = _impulse_scene()
    ref = _sgbm(p1=0, p2=0).compute(left, right)
    # far left of the impulse: pure WTA on ties would give 0
    assert ref[8, 30] == 16 * 5
    # and explicit P1=2,P2=5 reproduces the zero-penalty output exactly
    ref2 = _sgbm(p1=2, p2=5).compute(left, right)
    np.testing.assert_array_equal(ref, ref2)


def test_mode_hh_has_no_persistent_left_to_right_memory():
    """Rightward propagation is carried by diagonals only: its extent at
    row y is border-limited (max(y+1, H-y)), never reaching the right
    border the way the leftward horizontal path reaches the left one."""
    H, W, x0, shift = 16, 128, 60, 5
    left, right = _impulse_scene(H, W, x0, shift)
    ref = _sgbm().compute(left, right).astype(np.int64)
    for y in (0, 4, 8, 12, 15):
        idx = np.where(ref[y] == 16 * shift)[0]
        assert len(idx) > 0
        # leftward: full to the valid-range border
        assert idx.min() == 16
        # rightward: distance to the farther y-border, never the full row
        expect = x0 + max(y + 1, H - y)
        assert abs(int(idx.max()) - expect) <= 1
        assert idx.max() < W - 8  # nowhere near the right border


def test_real_config_agreement_level():
    """Textured scene, real penalties: bit-exactness >= 95% and
    1px-agreement ~100% (the BASELINE contract bar with margin)."""
    import os

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm

    H, W, D = 24, 128, 16
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (H, W + 2 * D)).astype(np.uint8)
    left, right = base[:, D : D + W], base[:, D + 5 : D + 5 + W]
    ref = _sgbm(bs=5, p1=200, p2=800, D=D).compute(left, right).astype(np.int64)
    p = StereoSGBMParams(num_disparities=D, block_size=5, p1=200, p2=800,
                         uniqueness_ratio=0, disp12_max_diff=-1, backend="scan")
    ours = np.round(
        np.asarray(stereo_sgbm(jnp.asarray(left, jnp.int32), jnp.asarray(right, jnp.int32), p)) * 16
    ).astype(np.int64)
    v = np.ones_like(ref, bool)
    v[:, :D] = False
    assert (ours[v] == ref[v]).mean() > 0.95
    assert (np.abs(ours[v] - ref[v]) <= 16).mean() > 0.995


def test_explicit_zero_penalties_honored_in_params():
    """Our params must honor explicit 0 (the falsy-default bug, fixed)."""
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams

    p = StereoSGBMParams(block_size=5, p1=0, p2=0)
    assert p.P1 == 0 and p.P2 == 0
    pd = StereoSGBMParams(block_size=5)
    assert pd.P1 == 200 and pd.P2 == 800
