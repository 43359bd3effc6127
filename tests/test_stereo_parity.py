"""Dense-stereo parity vs cv2.StereoBM / cv2.StereoSGBM.

Agreement metric per /root/repo/BASELINE.json: fraction of pixels where
both are invalid or |diff| <= 1 px; EPE on commonly-valid pixels.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.stereo import (
    StereoBMParams,
    stereo_bm,
    StereoSGBMParams,
    stereo_sgbm,
)


def synthetic_pair(h=240, w=320, max_disp=32, seed=0, noise=2.0):
    """Textured scene with a smooth disparity ramp + a foreground box."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(h, w + max_disp + 8)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.5)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = 6.0 + 10.0 * xx / w + 4.0 * yy / h
    box = (slice(h // 3, 2 * h // 3), slice(w // 3, 2 * w // 3))
    disp[box] = 24.0

    # Stereo convention: left[x] = right[x - d(x)], disparity in left coords.
    # right is the clean view; left samples base at x - d + max_disp.
    mapx_l = xx + max_disp - disp
    left = cv2.remap(base, mapx_l, yy, cv2.INTER_LINEAR)
    mapx_r = xx + max_disp
    right = cv2.remap(base, mapx_r, yy, cv2.INTER_LINEAR)

    left = np.clip(left + rng.normal(0, noise, left.shape), 0, 255).astype(np.uint8)
    right = np.clip(right + rng.normal(0, noise, right.shape), 0, 255).astype(np.uint8)
    return left, right, disp


def agreement(mine: np.ndarray, ref16: np.ndarray, invalid_val=-1.0):
    """(agree_frac, epe, valid_overlap) between float disp and cv2 int16*16."""
    ref = ref16.astype(np.float32) / 16.0
    ref_valid = ref16 > (invalid_val * 16)
    my_valid = mine > invalid_val
    both_valid = ref_valid & my_valid
    both_invalid = ~ref_valid & ~my_valid
    close = np.abs(mine - ref) <= 1.0
    agree = (both_invalid | (both_valid & close)).mean()
    epe = np.abs(mine[both_valid] - ref[both_valid]).mean() if both_valid.any() else np.inf
    return agree, epe, both_valid.mean()


class TestStereoBM:
    def _cv_bm(self, params: StereoBMParams):
        bm = cv2.StereoBM_create(params.num_disparities, params.block_size)
        bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
        bm.setPreFilterCap(params.prefilter_cap)
        bm.setTextureThreshold(params.texture_threshold)
        bm.setUniquenessRatio(params.uniqueness_ratio)
        bm.setMinDisparity(params.min_disparity)
        bm.setDisp12MaxDiff(-1)
        bm.setSpeckleWindowSize(0)
        return bm

    @pytest.mark.parametrize("seed", [0, 1])
    def test_parity_default(self, seed):
        left, right, _ = synthetic_pair(seed=seed)
        params = StereoBMParams(num_disparities=32, block_size=15)
        ref = self._cv_bm(params).compute(left, right)
        mine = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right), params))
        agree, epe, overlap = agreement(mine, ref)
        assert agree >= 0.98, (agree, epe, overlap)
        assert epe <= 0.2, epe
        assert overlap > 0.15

    def test_parity_config1_shape(self):
        """BASELINE config #1 geometry: 640x480, D=64, block 15."""
        left, right, _ = synthetic_pair(h=480, w=640, max_disp=64, seed=2)
        params = StereoBMParams(num_disparities=64, block_size=15)
        ref = self._cv_bm(params).compute(left, right)
        mine = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right), params))
        agree, epe, overlap = agreement(mine, ref)
        assert agree >= 0.98, (agree, epe, overlap)
        assert epe <= 0.2, epe

    def test_ground_truth_recovery(self):
        left, right, gt = synthetic_pair(h=480, w=640, max_disp=64, seed=3, noise=1.0)
        params = StereoBMParams(num_disparities=64, block_size=15)
        mine = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right), params))
        valid = mine > -1
        err = np.abs(mine[valid] - gt[valid])
        assert np.median(err) < 1.0


class TestStereoSGBM:
    def _cv_sgbm(self, p: StereoSGBMParams):
        return cv2.StereoSGBM_create(
            minDisparity=p.min_disparity,
            numDisparities=p.num_disparities,
            blockSize=p.block_size,
            P1=p.P1,
            P2=p.P2,
            disp12MaxDiff=p.disp12_max_diff,
            preFilterCap=p.prefilter_cap,
            uniquenessRatio=p.uniqueness_ratio,
            speckleWindowSize=p.speckle_window_size,
            speckleRange=p.speckle_range,
            mode=cv2.STEREO_SGBM_MODE_HH,
        )

    def test_parity_plain(self):
        """No post-processing: pure 8-path aggregation + subpixel."""
        left, right, _ = synthetic_pair(seed=4)
        p = StereoSGBMParams(num_disparities=32, block_size=5)
        ref = self._cv_sgbm(p).compute(left, right)
        mine = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right), p))
        agree, epe, overlap = agreement(mine, ref)
        assert agree >= 0.98, (agree, epe, overlap)
        assert epe <= 0.2, epe

    def test_parity_full_postprocessing(self):
        """Uniqueness + LR check + speckle filter all enabled."""
        left, right, _ = synthetic_pair(seed=5)
        p = StereoSGBMParams(
            num_disparities=32,
            block_size=5,
            uniqueness_ratio=10,
            disp12_max_diff=1,
            speckle_window_size=50,
            speckle_range=2,
        )
        ref = self._cv_sgbm(p).compute(left, right)
        mine = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right), p))
        agree, epe, overlap = agreement(mine, ref)
        assert agree >= 0.97, (agree, epe, overlap)
        assert epe <= 0.25, epe

    def test_ground_truth_recovery(self):
        left, right, gt = synthetic_pair(seed=6, noise=1.0)
        p = StereoSGBMParams(num_disparities=32, block_size=5, uniqueness_ratio=5)
        mine = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right), p))
        valid = mine > -1
        err = np.abs(mine[valid] - gt[valid])
        assert np.median(err) < 1.0
