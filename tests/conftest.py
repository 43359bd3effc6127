"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices, as the
driver does for ``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Precision follows input dtype: geometry parity tests feed float64 (as cv2
# does); TPU compute paths always pass float32/bfloat16 and are unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_mesh():
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")).reshape(4, 2)
    return Mesh(devs, ("data", "space"))
