"""Parity tests: Bouguet rectification + remap vs OpenCV."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.ops import (
    stereo_rectify,
    init_undistort_rectify_map,
    remap_bilinear,
)
from stereo_vision_tpu.ops.remap import remap_bilinear_mxu

K1 = np.array([[1400.0, 0, 960], [0, 1410.0, 540], [0, 0, 1]])
K2 = np.array([[1390.0, 0, 955], [0, 1402.0, 545], [0, 0, 1]])
D1 = np.array([-0.28, 0.09, 1.2e-3, -8e-4, -0.012])
D2 = np.array([-0.25, 0.07, -9e-4, 6e-4, -0.010])
SIZE = (1920, 1080)  # (width, height)


def _stereo_rt():
    R, _ = cv2.Rodrigues(np.array([0.02, -0.35, 0.015]))
    T = np.array([[-3500.0], [25.0], [120.0]])
    return R, T


@pytest.mark.parametrize("alpha", [-1.0, 0.0, 1.0, 0.5])
def test_stereo_rectify_matches_cv2(alpha):
    R, T = _stereo_rt()
    R1c, R2c, P1c, P2c, Qc, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R, T, alpha=alpha, flags=cv2.CALIB_ZERO_DISPARITY
    )
    res = stereo_rectify(K1, D1, K2, D2, SIZE, R, T, alpha=alpha)
    np.testing.assert_allclose(np.asarray(res.R1), R1c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.R2), R2c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.P1), P1c, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.P2), P2c, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.Q), Qc, rtol=1e-4, atol=1e-2)


def test_stereo_rectify_no_zero_disparity():
    R, T = _stereo_rt()
    R1c, R2c, P1c, P2c, Qc, _, _ = cv2.stereoRectify(K1, D1, K2, D2, SIZE, R, T, alpha=0, flags=0)
    res = stereo_rectify(K1, D1, K2, D2, SIZE, R, T, alpha=0.0, zero_disparity=False)
    np.testing.assert_allclose(np.asarray(res.P1), P1c, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.P2), P2c, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.Q), Qc, rtol=1e-4, atol=1e-2)


def test_init_undistort_rectify_map_matches_cv2():
    R, T = _stereo_rt()
    R1c, _, P1c, _, _, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R, T, alpha=0, flags=cv2.CALIB_ZERO_DISPARITY
    )
    mxc, myc = cv2.initUndistortRectifyMap(K1, D1, R1c, P1c, SIZE, cv2.CV_32FC1)
    mx, my = init_undistort_rectify_map(K1, D1, R1c, P1c, SIZE)
    np.testing.assert_allclose(np.asarray(mx), mxc, atol=2e-2)
    np.testing.assert_allclose(np.asarray(my), myc, atol=2e-2)


def _test_image(h=1080, w=1920, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)  # smooth so interp error is tiny
    return img


def test_remap_matches_cv2():
    R, T = _stereo_rt()
    R1c, _, P1c, _, _, _, _ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R, T, alpha=0, flags=cv2.CALIB_ZERO_DISPARITY
    )
    mx, my = cv2.initUndistortRectifyMap(K1, D1, R1c, P1c, SIZE, cv2.CV_32FC1)
    img = _test_image()
    cv_out = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
    jax_out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    # cv2 INTER_LINEAR uses 5-bit fixed-point interp weights; allow ~1 LSB of
    # that quantization plus border handling differences at the frame edge.
    interior = (slice(4, -4), slice(4, -4))
    diff = np.abs(jax_out[interior] - cv_out[interior])
    assert np.quantile(diff, 0.999) < 2.0
    assert diff.mean() < 0.25


def test_remap_mxu_matches_gather():
    rng = np.random.default_rng(3)
    h, w = 256, 512
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    # Smooth synthetic rectification-like map: small bounded displacement.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mx = xx + 5.0 * np.sin(yy / 50.0) + 3.0 * np.cos(xx / 80.0)
    my = yy + 4.0 * np.cos(xx / 60.0) + 2.0 * np.sin(yy / 40.0)
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    out = np.asarray(
        remap_bilinear_mxu(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my), row_tile=8, band=32)
    )
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_remap_multichannel():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, size=(64, 96, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    mx, my = xx + 0.5, yy - 0.25
    cv_out = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
    jax_out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    diff = np.abs(jax_out[2:-2, 2:-2] - cv_out[2:-2, 2:-2])
    assert diff.max() < 2.0


def test_remap_mxu_tiled_matches_gather():
    from stereo_vision_tpu.ops.remap import (
        remap_bilinear,
        remap_bilinear_mxu_tiled,
        plan_remap,
        make_remap,
    )

    rng = np.random.default_rng(5)
    H, W = 64, 256
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    map_x = jnp.asarray(xs + 3.0 * np.sin(ys / 17.0))
    map_y = jnp.asarray(ys + 2.0 * np.cos(xs / 23.0))
    kind, band = plan_remap(map_x, map_y, (H, W))
    assert kind == "mxu_tiled"
    out = remap_bilinear_mxu_tiled(img, map_x, map_y, band_y=band[0], band_x=band[1])
    ref = remap_bilinear(img, map_x, map_y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    fn = make_remap(map_x, map_y, (H, W))
    np.testing.assert_allclose(np.asarray(fn(img)), np.asarray(ref), atol=1e-3)


def test_plan_remap_falls_back_on_wild_maps():
    from stereo_vision_tpu.ops.remap import plan_remap

    rng = np.random.default_rng(0)
    H, W = 64, 256
    # maps that scatter all over the source: no bounded band exists
    map_x = jnp.asarray(rng.uniform(0, W - 1, (H, W)).astype(np.float32))
    map_y = jnp.asarray(rng.uniform(0, H - 1, (H, W)).astype(np.float32))
    kind, band = plan_remap(map_x, map_y, (H, W))
    assert kind == "gather"


def test_plan_remap_identity():
    from stereo_vision_tpu.ops.remap import plan_remap, remap_bilinear_mxu_tiled, remap_bilinear

    H, W = 32, 256  # wide enough that a 128+margin x-band fits
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    kind, band = plan_remap(jnp.asarray(xs), jnp.asarray(ys), (H, W))
    assert kind == "mxu_tiled"
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    out = remap_bilinear_mxu_tiled(img, jnp.asarray(xs), jnp.asarray(ys),
                                   band_y=band[0], band_x=band[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
