"""Host-side video IO shims.

Video decode and ffprobe stay on the host by design (SURVEY.md §2d:
"ffprobe — host-side IO shim; not TPU work"); everything downstream is
batched device work. Replaces the per-script frame-extraction loops
(reference: intrinsic.py:31-105, extrinsic.py:171-229,
calibrate_v4/optimal_frame_extractor.py:96) and the ffprobe timestamp
extractor (flash_sync.py:15-133).
"""

from __future__ import annotations

import json
import subprocess
from pathlib import Path
from typing import Iterator

import numpy as np

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".MP4", ".MOV")  # intrinsic.py:489-495


def find_video(directory: str | Path, stem: str) -> Path | None:
    """Locate a video by stem trying alternate extensions
    (the reference's fallback chain, intrinsic.py:489-495)."""
    d = Path(directory)
    for ext in VIDEO_EXTENSIONS:
        p = d / f"{stem}{ext}"
        if p.exists():
            return p
    return None


def iter_frames(
    video_path: str | Path,
    start: int = 0,
    interval: int = 1,
    max_frames: int | None = None,
    grayscale: bool = False,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_index, RGB/gray ndarray) from a video file."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise IOError(f"could not open video: {video_path}")
    if start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    idx = start
    emitted = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if (idx - start) % interval == 0:
                if grayscale:
                    out = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                else:
                    out = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                yield idx, out
                emitted += 1
                if max_frames is not None and emitted >= max_frames:
                    break
            idx += 1
    finally:
        cap.release()


def extract_frames(
    video_path: str | Path,
    start: int = 0,
    interval: int = 15,
    max_frames: int = 20,
    grayscale: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch frame extraction: (frames (T, H, W[, 3]), indices (T,)).

    Defaults mirror the reference's sampling (interval 15, max 20,
    start 30 handled by the caller's config — intrinsic.py:452-467).
    """
    frames, indices = [], []
    for idx, f in iter_frames(video_path, start, interval, max_frames, grayscale):
        frames.append(f)
        indices.append(idx)
    if not frames:
        return np.empty((0,)), np.empty((0,), np.int64)
    return np.stack(frames), np.asarray(indices)


def video_info(video_path: str | Path) -> dict:
    """fps / frame count / size via cv2 properties."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    try:
        return {
            "fps": cap.get(cv2.CAP_PROP_FPS),
            "frame_count": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        }
    finally:
        cap.release()


def extract_timestamps_ffprobe(video_path: str | Path) -> np.ndarray:
    """Per-frame presentation timestamps via ffprobe
    (flash_sync.py:15-133). Returns (T,) seconds; empty array if ffprobe
    is unavailable."""
    try:
        out = subprocess.run(
            [
                "ffprobe",
                "-v", "quiet",
                "-select_streams", "v:0",
                "-show_entries", "frame=pts_time",
                "-of", "json",
                str(video_path),
            ],
            capture_output=True,
            text=True,
            timeout=300,
        )
        frames = json.loads(out.stdout).get("frames", [])
        return np.array([float(f["pts_time"]) for f in frames if "pts_time" in f])
    except (OSError, subprocess.SubprocessError, json.JSONDecodeError):
        return np.empty(0)


def write_video(
    path: str | Path,
    frames: np.ndarray,
    fps: float = 30.0,
    is_rgb: bool = True,
) -> Path:
    """Write (T, H, W[, 3]) frames to an mp4 (cv2 VideoWriter host shim)."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames = np.asarray(frames)
    h, w = frames.shape[1], frames.shape[2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for f in frames:
            if f.ndim == 2:
                f = np.stack([f] * 3, axis=-1)
            elif is_rgb:
                f = f[..., ::-1]  # RGB -> BGR for cv2
            vw.write(np.ascontiguousarray(f, np.uint8))
    finally:
        vw.release()
    return path


class VideoSink:
    """Incremental mp4 writer: open once, append frames as they stream.

    ``write_video`` takes the whole clip at once; buffering a streaming
    pipeline's output that way is unbounded host memory (~2 MB/frame at
    1080p grayscale). The sink writes each window's frames as they
    arrive and sizes itself from the first frame.
    """

    def __init__(self, path: str | Path, fps: float = 30.0, is_rgb: bool = True):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.fps = float(fps)
        self.is_rgb = is_rgb
        self._vw = None
        self.frames = 0

    def append(self, frame: np.ndarray) -> None:
        import cv2

        f = np.asarray(frame)
        if self._vw is None:
            self._hw = (f.shape[0], f.shape[1])
            h, w = self._hw
            self._vw = cv2.VideoWriter(
                str(self.path), cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
            )
        elif (f.shape[0], f.shape[1]) != self._hw:
            # cv2.VideoWriter.write silently drops mismatched frames
            # (returns False without raising) — fail loudly instead.
            raise ValueError(
                f"frame shape {f.shape[:2]} != sink shape {self._hw}"
            )
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=-1)
        elif self.is_rgb:
            f = f[..., ::-1]  # RGB -> BGR for cv2
        self._vw.write(np.ascontiguousarray(f, np.uint8))
        self.frames += 1

    def close(self) -> None:
        if self._vw is not None:
            self._vw.release()
            self._vw = None

    def __enter__(self) -> "VideoSink":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def create_synchronized_videos(
    left_video: str | Path,
    right_video: str | Path,
    left_start: int,
    right_start: int,
    out_dir: str | Path,
    duration_frames: int | None = None,
    fps: float | None = None,
) -> tuple[Path, Path]:
    """Write an aligned stereo pair starting at the given frame indices
    (the reference writes flash+3s onward — flash_sync.py:238-319; callers
    pass flash_frame + 3*fps here)."""
    import cv2

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    outs = []
    for src, start, name in (
        (left_video, left_start, "left_synced.mp4"),
        (right_video, right_start, "right_synced.mp4"),
    ):
        cap = cv2.VideoCapture(str(src))
        src_fps = fps or cap.get(cv2.CAP_PROP_FPS) or 30.0
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        n = duration_frames if duration_frames is not None else total - start
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        dst = out_dir / name
        vw = cv2.VideoWriter(str(dst), cv2.VideoWriter_fourcc(*"mp4v"), src_fps, (w, h))
        try:
            for _ in range(max(n, 0)):
                ok, frame = cap.read()
                if not ok:
                    break
                vw.write(frame)
        finally:
            vw.release()
            cap.release()
        outs.append(dst)
    return outs[0], outs[1]
