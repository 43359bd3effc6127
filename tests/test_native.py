"""Native host-ops: C++ extension builds and matches the numpy fallback."""

import numpy as np
import pytest

from stereo_vision_tpu import native


def test_builds_and_loads():
    assert native.native_available(), "g++ extension failed to build"


def test_pack_gray_matches_numpy(rng):
    frames = rng.integers(0, 255, (4, 24, 32, 3)).astype(np.uint8)
    fast = native.pack_gray(frames)
    f = frames.astype(np.uint32)
    ref = ((77 * f[..., 0] + 150 * f[..., 1] + 29 * f[..., 2] + 128) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(fast, ref)


def test_brightness_series(rng):
    frames = rng.integers(0, 255, (6, 16, 16)).astype(np.uint8)
    b = native.brightness_series(frames)
    np.testing.assert_allclose(b, frames.mean(axis=(1, 2)), atol=1e-9)
    rgb = rng.integers(0, 255, (3, 8, 8, 3)).astype(np.uint8)
    b2 = native.brightness_series(rgb)
    ref = native.pack_gray(rgb).mean(axis=(1, 2))
    np.testing.assert_allclose(b2, ref, atol=1e-9)
