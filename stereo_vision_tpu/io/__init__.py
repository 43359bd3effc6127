"""Host-side data IO: video decode, ffprobe timestamps, frame extraction."""

from stereo_vision_tpu.io.video import (
    VIDEO_EXTENSIONS,
    find_video,
    iter_frames,
    extract_frames,
    video_info,
    extract_timestamps_ffprobe,
)

__all__ = [
    "VIDEO_EXTENSIONS",
    "find_video",
    "iter_frames",
    "extract_frames",
    "video_info",
    "extract_timestamps_ffprobe",
]
