"""Stereo stream synchronization.

TPU-native rebuild of the reference's flash-pulse synchronization
(reference: stereo_calibration/scripts/flash_sync.py) and content-based
frame matching (reference: scripts/archive/frame_matcher.py:160-344).

The reference scans videos frame-by-frame on the host; here the per-frame
brightness reduction, the trailing-window jump test, the timestamp offset
search and the similarity matrix are all batched jit programs — time is a
batch axis (SURVEY.md §5).
"""

from stereo_vision_tpu.sync.flash import (
    frame_brightness,
    adaptive_flash_threshold,
    detect_flash,
    compute_sync_offset,
    FlashSyncResult,
    synchronize_streams,
)
from stereo_vision_tpu.sync.mapper import StereoFrameMapper
from stereo_vision_tpu.sync.matching import (
    frame_similarity,
    similarity_matrix,
    find_best_offset_by_content,
    match_frames_by_timestamp,
)

__all__ = [
    "frame_brightness",
    "adaptive_flash_threshold",
    "detect_flash",
    "compute_sync_offset",
    "FlashSyncResult",
    "synchronize_streams",
    "frame_similarity",
    "similarity_matrix",
    "find_best_offset_by_content",
    "match_frames_by_timestamp",
    "StereoFrameMapper",
]
