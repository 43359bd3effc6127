"""Building blocks for the detection/pose networks (flax.linen).

The reference delegates its CNNs to ultralytics YOLOv8 (PyTorch) and
MediaPipe Pose (TFLite) — see SURVEY.md §2d. These are the TPU-native
blocks they are rebuilt from: Conv+BN+SiLU, C2f (cross-stage partial with
split/append), SPPF (stacked 5x5 max-pool pyramid) — NHWC layout, bf16-
friendly, MXU-sized channel counts.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBnSiLU(nn.Module):
    """3x3/1x1 conv + BatchNorm + SiLU, the universal YOLO block."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            use_bias=False,
            dtype=x.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=x.dtype
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual."""

    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBnSiLU(self.features, 3)(x, train)
        y = ConvBnSiLU(self.features, 3)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    """Cross-stage-partial block: split, run n bottlenecks appending each
    output, concat everything, fuse with a 1x1 conv."""

    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features // 2
        y = ConvBnSiLU(2 * c, 1)(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        for _ in range(self.n):
            y2 = Bottleneck(c, self.shortcut)(y2, train)
            outs.append(y2)
        return ConvBnSiLU(self.features, 1)(jnp.concatenate(outs, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three stacked 5x5 max-pools."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features // 2
        x = ConvBnSiLU(c, 1)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnSiLU(self.features, 1)(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train
        )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def make_divisible(v: float, divisor: int = 8) -> int:
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def scaled_widths(widths: Sequence[int], width_mult: float) -> list[int]:
    return [make_divisible(w * width_mult) for w in widths]
