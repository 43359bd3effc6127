"""Diversity-based calibration-frame selection.

Vectorized port of the reference's optimal frame extractor idea
(reference: calibration_tests/calibrate_v4/optimal_frame_extractor.py:26-94):
each detected board gets a 6-dim feature vector — normalized center (2),
corner-spread sigma (1), principal-axis angle as cos/sin (2), aspect ratio
(1) — and frames are kept greedily if their min Euclidean distance to
already-selected features exceeds a threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def frame_diversity_features(corners: jnp.ndarray, image_size: tuple[int, int]) -> jnp.ndarray:
    """(F, 6) feature vectors from (F, N, 2) detected corner sets."""
    w, h = image_size
    c = jnp.asarray(corners)
    center = c.mean(axis=1)  # (F, 2)
    center_n = center / jnp.array([w, h])
    rel = c - center[:, None, :]
    spread = jnp.sqrt((rel ** 2).sum(-1)).std(axis=1) / jnp.sqrt(w * w + h * h)

    # Principal axis via 2x2 covariance eigenvector.
    cov = jnp.einsum("fni,fnj->fij", rel, rel) / c.shape[1]
    # Angle of dominant eigenvector of [[a,b],[b,d]]: 0.5*atan2(2b, a-d).
    ang = 0.5 * jnp.arctan2(2 * cov[:, 0, 1], cov[:, 0, 0] - cov[:, 1, 1])
    ext = c.max(axis=1) - c.min(axis=1)
    aspect = ext[:, 0] / jnp.maximum(ext[:, 1], 1e-6)
    return jnp.concatenate(
        [center_n, spread[:, None], jnp.cos(ang)[:, None], jnp.sin(ang)[:, None], aspect[:, None]],
        axis=1,
    )


def select_diverse_frames(
    corners: np.ndarray,
    image_size: tuple[int, int],
    max_frames: int = 25,
    min_distance: float = 0.15,
) -> np.ndarray:
    """Greedy min-distance selection; returns kept frame indices."""
    feats = np.asarray(frame_diversity_features(jnp.asarray(corners), image_size))
    kept: list[int] = []
    for i in range(len(feats)):
        if len(kept) >= max_frames:
            break
        if not kept:
            kept.append(i)
            continue
        d = np.linalg.norm(feats[kept] - feats[i], axis=1).min()
        if d >= min_distance:
            kept.append(i)
    return np.asarray(kept, np.int64)
