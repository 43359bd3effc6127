"""Matmul precision control for geometry ops.

On TPU, float32 matmuls run in bfloat16 passes by default (MXU), which
costs ~3 decimal digits — enough to turn sub-micron geometry into
pixel-level error (observed: 1.3 px epipolar misalignment after
rectification). The geometry ops all use tiny 3x3/4x4 contractions, so
forcing full-precision accumulation is free; the dense image kernels keep
the fast default.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Decorator: trace ``fn`` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
