"""Mesh/sharding definitions and sharded stream pipelines (SURVEY.md §2e, §7.9)."""

from stereo_vision_tpu.parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    create_mesh,
    host_cpu_mesh,
    batch_sharding,
    batch_rows_sharding,
    replicated,
)
from stereo_vision_tpu.parallel.streaming import (
    batched_stereo_pipeline,
    make_sharded_pipeline,
    StereoStreamProcessor,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "create_mesh",
    "host_cpu_mesh",
    "batch_sharding",
    "batch_rows_sharding",
    "replicated",
    "batched_stereo_pipeline",
    "make_sharded_pipeline",
    "StereoStreamProcessor",
]
