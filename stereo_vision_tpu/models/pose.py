"""33-landmark pose network (MediaPipe Pose interface parity).

TPU-native replacement for the reference's MediaPipe dependency
(reference: 3dpose.py:44-46, :330-341 — a C++ graph + TFLite model per
camera, per frame). Interface contract (SURVEY.md §2d): images
``[B, H, W, 3]`` -> landmarks ``[B, 33, 4]`` with (x, y, z, visibility),
x/y normalized to [0, 1] like MediaPipe, so the downstream scaling to
pixels is identical.

Design: lightweight CSP backbone (shared blocks with the detector) into a
dual head — heatmap head for (x, y) via spatial soft-argmax (keeps
gradients dense and avoids argmax non-differentiability) plus a regression
head for z and visibility. Both cameras' frames batch into one jit graph:
``[2B, H, W, 3]`` — no per-frame host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereo_vision_tpu.models.layers import C2f, ConvBnSiLU, SPPF, upsample2x

NUM_LANDMARKS = 33


class PoseNet(nn.Module):
    """33-landmark pose estimator with soft-argmax heatmap decoding."""

    width: int = 32
    num_landmarks: int = NUM_LANDMARKS

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.width
        # Backbone: /16 with CSP stages.
        x = ConvBnSiLU(w, 3, 2)(x, train)         # /2
        x = ConvBnSiLU(2 * w, 3, 2)(x, train)     # /4
        x = C2f(2 * w, 1)(x, train)
        x = ConvBnSiLU(4 * w, 3, 2)(x, train)     # /8
        p8 = C2f(4 * w, 2)(x, train)
        x = ConvBnSiLU(8 * w, 3, 2)(p8, train)    # /16
        x = C2f(8 * w, 2)(x, train)
        x = SPPF(8 * w)(x, train)

        # Heatmap head at /8 via one upsample + skip.
        h = jnp.concatenate([upsample2x(x), p8], axis=-1)
        h = C2f(4 * w, 1, shortcut=False)(h, train)
        heat = nn.Conv(self.num_landmarks, (1, 1), dtype=x.dtype)(h)  # (B, H/8, W/8, L)

        # Soft-argmax over the heatmap -> normalized (x, y).
        B, Hh, Wh, L = heat.shape
        logits = heat.reshape(B, Hh * Wh, L)
        att = jax.nn.softmax(logits, axis=1).reshape(B, Hh, Wh, L)
        ys = (jnp.arange(Hh, dtype=att.dtype) + 0.5) / Hh
        xs = (jnp.arange(Wh, dtype=att.dtype) + 0.5) / Wh
        ex = jnp.einsum("bhwl,w->bl", att, xs)
        ey = jnp.einsum("bhwl,h->bl", att, ys)

        # z + visibility from pooled features.
        g = jnp.mean(x, axis=(1, 2))
        zv = nn.Dense(2 * self.num_landmarks, dtype=x.dtype)(nn.silu(nn.Dense(8 * w)(g)))
        z = zv[:, : self.num_landmarks]
        vis = jax.nn.sigmoid(zv[:, self.num_landmarks :])

        return jnp.stack([ex, ey, z, vis], axis=-1)  # (B, 33, 4)


def pose_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, vis_weight: float = 1.0
) -> jnp.ndarray:
    """L1 on (x, y, z) weighted by GT visibility + BCE on visibility.

    Args:
      pred, gt: (B, 33, 4) landmark tensors, gt[..., 3] in {0, 1}.
    """
    v = gt[..., 3]
    l1 = jnp.abs(pred[..., :3] - gt[..., :3]).sum(-1)
    coord = jnp.sum(l1 * v) / jnp.maximum(jnp.sum(v), 1.0)
    p = jnp.clip(pred[..., 3], 1e-6, 1 - 1e-6)
    bce = -jnp.mean(v * jnp.log(p) + (1 - v) * jnp.log(1 - p))
    return coord + vis_weight * bce


def landmarks_to_pixels(landmarks: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Normalized [B, 33, 4] -> pixel coordinates (the scaling step the
    reference applies before triangulation)."""
    scale = jnp.array([width, height, 1.0, 1.0], landmarks.dtype)
    return landmarks * scale
