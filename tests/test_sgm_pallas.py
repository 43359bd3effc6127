"""Pallas SGM aggregation kernels vs the lax.scan reference (exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_vision_tpu.stereo.sgbm import _aggregate_8
from stereo_vision_tpu.stereo.sgm_pallas import aggregate_8_pallas


@pytest.mark.parametrize("shape", [(24, 40, 16), (17, 33, 32)])
def test_pallas_matches_scan_exactly(shape, rng):
    H, W, D = shape
    # realistic cost magnitudes: windowed BT cost <= ~4.7k
    C = jnp.asarray(rng.integers(0, 4700, (H, W, D)), jnp.int32)
    P1, P2 = 200, 800
    ref = np.asarray(_aggregate_8(C, P1, P2, backend="scan"))
    out = np.asarray(aggregate_8_pallas(C, P1, P2, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_extreme_costs(rng):
    # Zero and max-bound costs hit the int16 headroom edges.
    H, W, D = 16, 24, 16
    C = np.zeros((H, W, D), np.int32)
    C[::2] = 4700
    ref = np.asarray(_aggregate_8(jnp.asarray(C), 200, 800, backend="scan"))
    out = np.asarray(aggregate_8_pallas(jnp.asarray(C), 200, 800, interpret=True))
    np.testing.assert_array_equal(out, ref)
