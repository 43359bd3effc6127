"""Flash-pulse synchronization as batched JAX reductions.

Behavioral parity with the reference's adaptive flash detector
(reference: stereo_calibration/scripts/flash_sync.py:398-521):

  1. Per-frame mean grayscale brightness.
  2. Adaptive threshold from ~30 sampled frames: max(15, 3*std), scaled
     0.8x (floor 10) for dark videos (mean < 50) and 1.5x for bright
     videos (mean > 200)  (flash_sync.py:443-460).
  3. Flash = first frame whose brightness exceeds the trailing
     ``window_size``-frame mean by more than the threshold
     (flash_sync.py:474-502).
  4. Stereo offset = right_flash - left_flash  (flash_sync.py:594).

The reference walks the video one frame at a time on the host; here the
whole brightness series is one jitted reduction over a (T, H, W[, 3])
batch and the jump test is a vectorized trailing-window comparison, so a
full clip synchronizes in a single device program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights, matching cv2.cvtColor(BGR2GRAY) (which the
# reference applies before np.mean, flash_sync.py:470-472). Channel order
# here is RGB; callers with BGR frames should flip the last axis first.
_LUMA_RGB = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


@jax.jit
def frame_brightness(frames: jnp.ndarray) -> jnp.ndarray:
    """Mean grayscale brightness per frame.

    Args:
      frames: (T, H, W) grayscale or (T, H, W, 3) RGB, any integer/float dtype.

    Returns:
      (T,) float32 brightness series.
    """
    f = frames.astype(jnp.float32)
    if f.ndim == 4:
        f = f @ _LUMA_RGB
    return jnp.mean(f, axis=(1, 2))


def adaptive_flash_threshold(
    brightness: jnp.ndarray,
    base_threshold: float = 20.0,
    sample_stride: int = 10,
    num_samples: int = 30,
    min_samples: int = 10,
) -> jnp.ndarray:
    """Adaptive threshold from the reference's sampling rule.

    Samples every ``sample_stride``-th frame (up to ``num_samples``), then
    threshold = max(15, 3*std); *0.8 with floor 10 if mean < 50; *1.5 if
    mean > 200 (flash_sync.py:424-460). Falls back to ``base_threshold``
    when fewer than ``min_samples`` samples are available.
    """
    sampled = brightness[::sample_stride][:num_samples]
    n = sampled.shape[0]
    if n < min_samples:
        return jnp.float32(base_threshold)
    avg = jnp.mean(sampled)
    std = jnp.std(sampled)
    thr = jnp.maximum(15.0, 3.0 * std)
    thr = jnp.where(avg < 50.0, jnp.maximum(10.0, thr * 0.8), thr)
    thr = jnp.where(avg > 200.0, thr * 1.5, thr)
    return thr.astype(jnp.float32)


def _trailing_mean(brightness: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Mean of the ``window_size`` frames strictly before each frame.

    Entries with fewer than ``window_size`` predecessors are +inf (the
    reference only tests once the history is full, flash_sync.py:482).
    """
    c = jnp.concatenate([jnp.zeros(1, brightness.dtype), jnp.cumsum(brightness)])
    t = brightness.shape[0]
    idx = jnp.arange(t)
    lo = idx - window_size
    hi = idx
    win = (c[hi] - c[jnp.maximum(lo, 0)]) / window_size
    return jnp.where(lo >= 0, win, jnp.inf)


@jax.jit
def _flash_index(brightness: jnp.ndarray, threshold: jnp.ndarray, window_size: int = 5):
    prev_avg = _trailing_mean(brightness, window_size)
    jump = brightness > prev_avg + threshold
    idx = jnp.argmax(jump)
    found = jnp.any(jump)
    return idx, found, prev_avg


def detect_flash(
    frames_or_brightness: jnp.ndarray,
    threshold: float | None = None,
    window_size: int = 5,
    max_frames: int = 900,
) -> int | None:
    """First flash frame in a stream, or None.

    Args:
      frames_or_brightness: (T, H, W[, 3]) frames or a precomputed (T,)
        brightness series.
      threshold: fixed jump threshold; None selects the adaptive rule.
      window_size: trailing baseline window (flash_sync.py default 5).
      max_frames: scan limit (flash_sync.py default 900 = 30s@30fps).
    """
    arr = jnp.asarray(frames_or_brightness)
    b = arr if arr.ndim == 1 else frame_brightness(arr)
    b = b[:max_frames]
    thr = adaptive_flash_threshold(b) if threshold is None else jnp.float32(threshold)
    idx, found, _ = _flash_index(b, thr, window_size)
    return int(idx) if bool(found) else None


class FlashSyncResult(NamedTuple):
    left_flash: int | None
    right_flash: int | None
    offset: int | None      # right_flash - left_flash
    threshold_left: float
    threshold_right: float


def compute_sync_offset(left_flash: int | None, right_flash: int | None) -> int | None:
    """Frame offset to add to left indices to land on the matching right
    frame (flash_sync.py:594: offset = right_flash - left_flash)."""
    if left_flash is None or right_flash is None:
        return None
    return int(right_flash) - int(left_flash)


def synchronize_streams(
    left_frames: jnp.ndarray,
    right_frames: jnp.ndarray,
    threshold: float | None = None,
    window_size: int = 5,
    max_frames: int = 900,
) -> FlashSyncResult:
    """Full flash-sync: both streams' detection in one batched pass."""
    lb = frame_brightness(jnp.asarray(left_frames))[:max_frames]
    rb = frame_brightness(jnp.asarray(right_frames))[:max_frames]
    if threshold is None:
        lt = float(adaptive_flash_threshold(lb))
        rt = float(adaptive_flash_threshold(rb))
    else:
        lt = rt = float(threshold)
    li, lf, _ = _flash_index(lb, jnp.float32(lt), window_size)
    ri, rf, _ = _flash_index(rb, jnp.float32(rt), window_size)
    left = int(li) if bool(lf) else None
    right = int(ri) if bool(rf) else None
    return FlashSyncResult(
        left_flash=left,
        right_flash=right,
        offset=compute_sync_offset(left, right),
        threshold_left=lt,
        threshold_right=rt,
    )


def match_offset_by_timestamps(
    left_ts: np.ndarray,
    right_ts: np.ndarray,
    search: int = 20,
    probe: int = 10,
) -> int:
    """Timestamp-based offset search (flash_sync.py:164-236), vectorized.

    Tries integer offsets in [-search, search]; for each, averages the
    |Δt| over the first ``probe`` aligned frames; returns the argmin
    offset (positive offset = right starts later).
    """
    left_ts = np.asarray(left_ts, np.float64)
    right_ts = np.asarray(right_ts, np.float64)
    best_offset, min_diff = 0, np.inf
    for offset in range(-search, search + 1):
        if offset < 0:
            li, ri = -offset, 0
        else:
            li, ri = 0, offset
        n = min(probe, len(left_ts) - li, len(right_ts) - ri)
        if n <= 0:
            continue
        d = np.abs(left_ts[li : li + n] - right_ts[ri : ri + n]).mean()
        if d < min_diff:
            min_diff, best_offset = d, offset
    return best_offset
