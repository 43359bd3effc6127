"""Device mesh and sharding definitions.

The reference has no distributed layer at all (SURVEY.md §2e) — this is
the TPU-native communication design, not a port: a 2D
``Mesh(data, space)`` where

- ``data``  shards independent work: stereo pairs, video segments,
  batched streams (pure data parallelism — zero collectives in the
  forward path, psum only for training grads),
- ``space`` shards within one frame/model: image row bands for
  remap/cost-volume (spatial parallelism) and channel/feature dimensions
  of the neural detectors (tensor parallelism). XLA inserts the halo
  exchanges / all-gathers over ICI.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def create_mesh(
    n_data: int | None = None,
    n_space: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    Args:
      n_data: devices along the data axis (default: all // n_space).
      n_space: devices along the space axis.
    """
    devs = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devs) // n_space
    need = n_data * n_space
    if need > len(devs):
        raise ValueError(f"mesh {n_data}x{n_space} needs {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def host_cpu_mesh(n_devices: int, n_space: int = 1) -> Mesh:
    """Virtual CPU mesh for sharding validation without TPU hardware
    (the driver's ``xla_force_host_platform_device_count`` path)."""
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag
    cpus = jax.devices("cpu")
    return create_mesh(n_devices // n_space, n_space, devices=cpus[:n_devices])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/stream) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_rows_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, H, W) frames: batch over ``data``, rows over ``space``
    (remap / cost-volume spatial tiling)."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
