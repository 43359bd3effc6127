"""Typed configs, artifact store (reference on-disk schema interop),
orchestrated stages with quality gates (SURVEY.md §7.8)."""

from stereo_vision_tpu.pipeline.config import (
    PipelineConfig,
    BoardConfig,
    FrameExtractionConfig,
    IntrinsicConfig,
    StereoConfig,
    SyncConfig,
    DisparityConfig,
    TrackConfig,
)
from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
from stereo_vision_tpu.pipeline.stages import (
    PipelineGateError,
    StageReport,
    run_intrinsic_stage,
    run_extrinsic_stage,
    run_rectification_stage,
    run_sync_stage,
)

__all__ = [
    "PipelineConfig",
    "BoardConfig",
    "FrameExtractionConfig",
    "IntrinsicConfig",
    "StereoConfig",
    "SyncConfig",
    "DisparityConfig",
    "TrackConfig",
    "ArtifactStore",
    "PipelineGateError",
    "StageReport",
    "run_intrinsic_stage",
    "run_extrinsic_stage",
    "run_rectification_stage",
    "run_sync_stage",
]
