"""Synchronization layer tests: flash detection, offsets, content matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_vision_tpu.sync import (
    frame_brightness,
    adaptive_flash_threshold,
    detect_flash,
    synchronize_streams,
    find_best_offset_by_content,
    match_frames_by_timestamp,
    similarity_matrix,
)


def _make_flash_video(T, H, W, flash_at, base=40.0, flash_level=200.0, noise=2.0, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.clip(base + rng.normal(0, noise, (T, H, W)), 0, 255)
    frames[flash_at] = flash_level
    frames[flash_at + 1] = flash_level * 0.8
    return frames.astype(np.uint8)


class TestFlashDetection:
    def test_brightness_reduction(self):
        frames = np.full((4, 8, 8), 100, np.uint8)
        b = np.asarray(frame_brightness(jnp.asarray(frames)))
        np.testing.assert_allclose(b, 100.0, atol=1e-4)

    def test_brightness_rgb_luma(self):
        frames = np.zeros((1, 4, 4, 3), np.uint8)
        frames[..., 1] = 100  # green only
        b = float(frame_brightness(jnp.asarray(frames))[0])
        assert abs(b - 58.7) < 0.1  # BT.601 green weight

    def test_detects_flash_frame(self):
        frames = _make_flash_video(120, 16, 16, flash_at=50)
        assert detect_flash(frames) == 50

    def test_no_flash_returns_none(self):
        frames = _make_flash_video(60, 16, 16, flash_at=0, flash_level=41.0)
        # flash at frame 0 can't be detected (no trailing window) and the
        # level is within noise — nothing should fire.
        assert detect_flash(frames) is None

    def test_adaptive_threshold_dark_video(self):
        b = jnp.full(300, 30.0)  # dark, zero variance
        thr = float(adaptive_flash_threshold(b))
        # std=0 -> max(15, 0)=15, dark scaling 0.8 -> 12
        assert abs(thr - 12.0) < 1e-5

    def test_adaptive_threshold_bright_video(self):
        b = jnp.full(300, 220.0)
        thr = float(adaptive_flash_threshold(b))
        assert abs(thr - 22.5) < 1e-5  # 15 * 1.5

    def test_stereo_offset(self):
        left = _make_flash_video(120, 16, 16, flash_at=40, seed=1)
        right = _make_flash_video(120, 16, 16, flash_at=47, seed=2)
        res = synchronize_streams(left, right)
        assert res.left_flash == 40
        assert res.right_flash == 47
        assert res.offset == 7

    def test_max_frames_limit(self):
        frames = _make_flash_video(200, 8, 8, flash_at=150)
        assert detect_flash(frames, max_frames=100) is None


class TestContentMatching:
    def test_similarity_matrix_psnr(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (3, 16, 16)).astype(np.float32)
        sim = np.asarray(similarity_matrix(jnp.asarray(a), jnp.asarray(a)))
        # Diagonal = identical frames = huge PSNR.
        assert (np.diag(sim) > 60).all()
        assert (sim - np.diag(np.diag(sim)) < 40).all()

    def test_recovers_known_offset(self):
        rng = np.random.default_rng(3)
        base = rng.integers(0, 255, (50, 16, 16)).astype(np.uint8)
        left = base[5:45]
        right = base[8:48]  # right starts 3 frames later in content
        off, score = find_best_offset_by_content(left, right, search_window=10)
        assert off == -3
        assert score > 60

    @pytest.mark.parametrize("true_offset", [-4, 0, 6])
    def test_timestamp_matching(self, true_offset):
        t = np.arange(60) / 30.0
        left_ts = t
        right_ts = t + true_offset / 30.0  # right timestamps shifted
        pairs = match_frames_by_timestamp(left_ts, right_ts, max_time_diff=0.01)
        assert len(pairs) > 10
        li, ri = pairs[0]
        # aligned pairs must have near-equal timestamps
        assert abs(left_ts[li] - right_ts[ri]) <= 0.01
