"""Band-sharded pipelined SGM aggregation == single-device scan, exactly.

Runs on the virtual 8-device CPU mesh from conftest; the carries cross
real (virtual-)device boundaries via ppermute, so this validates the
multi-chip path end to end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_vision_tpu.parallel.mesh import host_cpu_mesh
from stereo_vision_tpu.parallel.sgm_sharded import sgm_aggregate_sharded
from stereo_vision_tpu.stereo.sgbm import _aggregate_8


@pytest.fixture(scope="module")
def mesh4():
    return host_cpu_mesh(4, n_space=4)  # 4 bands, data axis = 1


@pytest.mark.parametrize("num_paths", [8, 4])
@pytest.mark.parametrize("F", [1, 3, 6])
def test_sharded_aggregation_exact(mesh4, num_paths, F):
    rng = np.random.default_rng(42 + F)
    H, W, D = 16, 24, 8
    C = rng.integers(0, 3000, (F, H, W, D)).astype(np.int32)
    got = np.asarray(
        sgm_aggregate_sharded(jnp.asarray(C), 200, 800, mesh4, num_paths=num_paths)
    )
    for f in range(F):
        ref = np.asarray(
            _aggregate_8(jnp.asarray(C[f]), 200, 800, backend="scan", num_paths=num_paths)
        )
        np.testing.assert_array_equal(got[f], ref, err_msg=f"frame {f}")


def test_uneven_band_raises(mesh4):
    C = jnp.zeros((1, 10, 8, 8), jnp.int32)  # 10 rows not divisible by 4
    with pytest.raises(ValueError, match="divisible"):
        sgm_aggregate_sharded(C, 200, 800, mesh4)
