"""Content-based and timestamp-based frame matching.

Rebuild of the reference's flash-free synchronization fallbacks:
- PSNR/MSE frame similarity + sliding-window offset search
  (reference: scripts/archive/frame_matcher.py:160-344).
- Timestamp proximity matching with max time difference
  (reference: scripts/flash_sync.py:164-236).

The reference compares one candidate pair at a time; here the whole
(T_left x window) similarity matrix is a single jit program — every
candidate alignment is scored at once on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.sync.flash import match_offset_by_timestamps


@jax.jit
def frame_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR between two same-shape grayscale frames (higher = more similar).

    Matches the reference's cv2.PSNR path (frame_matcher.py:185-187)
    with MAX_I = 255.
    """
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    mse = jnp.mean((af - bf) ** 2)
    mse = jnp.maximum(mse, 1e-10)
    return 10.0 * jnp.log10(255.0**2 / mse)


@jax.jit
def similarity_matrix(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(Tl, Tr) PSNR matrix between two grayscale frame stacks.

    Args:
      left: (Tl, H, W), right: (Tr, H, W) — same spatial size.
    """
    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    # mse[i, j] = mean((l_i - r_j)^2) = m(l_i^2) + m(r_j^2) - 2*m(l_i*r_j);
    # the cross term is a single (Tl, P) @ (P, Tr) matmul on the MXU.
    p = lf.shape[1] * lf.shape[2]
    l2 = jnp.mean(lf.reshape(lf.shape[0], -1) ** 2, axis=1)
    r2 = jnp.mean(rf.reshape(rf.shape[0], -1) ** 2, axis=1)
    cross = (
        jnp.dot(
            lf.reshape(lf.shape[0], -1),
            rf.reshape(rf.shape[0], -1).T,
            preferred_element_type=jnp.float32,
        )
        / p
    )
    mse = jnp.maximum(l2[:, None] + r2[None, :] - 2.0 * cross, 1e-10)
    return 10.0 * jnp.log10(255.0**2 / mse)


def find_best_offset_by_content(
    left: jnp.ndarray,
    right: jnp.ndarray,
    search_window: int = 30,
) -> tuple[int, float]:
    """Best integer frame offset by average PSNR along the aligned diagonal.

    Replaces the reference's per-pair sliding-window loop
    (frame_matcher.py:201-344) with one similarity-matrix program and a
    host-side diagonal reduction.

    Returns:
      (offset, score): add ``offset`` to a left index to get the matching
      right index; score is the mean PSNR of the aligned overlap.
    """
    sim = np.asarray(similarity_matrix(jnp.asarray(left), jnp.asarray(right)))
    tl, tr = sim.shape
    best_off, best_score = 0, -np.inf
    for off in range(-search_window, search_window + 1):
        li = np.arange(max(0, -off), min(tl, tr - off))
        if len(li) == 0:
            continue
        score = sim[li, li + off].mean()
        if score > best_score:
            best_score, best_off = float(score), off
    return best_off, best_score


def match_frames_by_timestamp(
    left_ts: np.ndarray,
    right_ts: np.ndarray,
    max_time_diff: float = 0.1,
    search: int = 20,
) -> list[tuple[int, int]]:
    """Timestamp-proximity frame pairing (flash_sync.py:164-236).

    Finds the best integer offset over ±``search`` frames, then pairs
    aligned frames whose |Δt| <= ``max_time_diff``; falls back to identity
    pairing when nothing matches (flash_sync.py:228-234).
    """
    left_ts = np.asarray(left_ts, np.float64)
    right_ts = np.asarray(right_ts, np.float64)
    off = match_offset_by_timestamps(left_ts, right_ts, search=search)
    li0, ri0 = (abs(off), 0) if off < 0 else (0, off)
    n = min(len(left_ts) - li0, len(right_ts) - ri0)
    pairs = []
    for i in range(n):
        if abs(left_ts[li0 + i] - right_ts[ri0 + i]) <= max_time_diff:
            pairs.append((li0 + i, ri0 + i))
    if not pairs:
        pairs = [(i, i) for i in range(min(len(left_ts), len(right_ts)))]
    return pairs
