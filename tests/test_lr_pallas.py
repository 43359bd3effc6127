"""Fused Pallas LR-consistency kernel vs the XLA static-shift chains.

The hier batch assemble requests lr_fail(backend="pallas") explicitly on
TPU (stereo/hier.py); these tests pin the kernel bit-identical to the
scan formulation (interpret mode, CPU) on banded-SGBM-shaped inputs —
WTA winners spread over the FULL range with subpixel float disparities,
including LR-inconsistent regions (mask must fire) and the cv2
floor/ceil double-lookup rule.
"""

import functools as ft

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.stereo.sgbm import lr_fail
import stereo_vision_tpu.stereo.lr_pallas as lp


@pytest.fixture
def interpret_lr(monkeypatch):
    monkeypatch.setattr(
        lp, "lr_fail_pallas", ft.partial(lp.lr_fail_pallas.__wrapped__, interpret=True)
    )


def _rand_inputs(H, W, ndisp, min_x, seed):
    """Random WTA-like stats: integer costs, winners over the full range,
    subpixel disparities within +-0.5 of the winner (hier convention)."""
    rng = np.random.default_rng(seed)
    Wv = W - min_x
    minS = rng.integers(0, 5000, (H, Wv)).astype(np.int32)
    best = rng.integers(0, ndisp, (H, Wv)).astype(np.int32)
    disp = best + rng.uniform(-0.5, 0.5, (H, Wv)).astype(np.float32)
    return jnp.asarray(minS), jnp.asarray(best), jnp.asarray(disp)


@pytest.mark.parametrize(
    "H,W,ndisp,max_diff,seed",
    [
        (40, 256, 64, 1, 0),     # hier-like: full-range winners, band stats
        (50, 320, 32, 1, 1),     # coarse-like: H far from the 128-row pad
        (140, 256, 64, 0, 2),    # >1 row block, strict max_diff
    ],
)
def test_pallas_mask_equals_scan(interpret_lr, H, W, ndisp, max_diff, seed):
    minS, best, disp = _rand_inputs(H, W, ndisp, ndisp, seed)
    kw = dict(W=W, min_x=ndisp, ndisp=ndisp, mindisp=0, max_diff=max_diff)
    ref = lr_fail(minS, best, disp, backend="scan", **kw)
    got = lr_fail(minS, best, disp, backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_consistent_scene_passes(interpret_lr):
    """A geometrically consistent constant-disparity scene must not fire."""
    H, W, ndisp = 32, 192, 32
    Wv = W - ndisp
    minS = jnp.ones((H, Wv), jnp.int32) * 7
    best = jnp.full((H, Wv), 9, jnp.int32)
    disp = jnp.full((H, Wv), 9.0, jnp.float32)
    kw = dict(W=W, min_x=ndisp, ndisp=ndisp, mindisp=0, max_diff=1)
    got = np.asarray(lr_fail(minS, best, disp, backend="pallas", **kw))
    ref = np.asarray(lr_fail(minS, best, disp, backend="scan", **kw))
    np.testing.assert_array_equal(got, ref)
    # Interior pixels (right-projection target in range) must pass.
    assert not got[:, 9 + 1 :].any()
