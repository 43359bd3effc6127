"""Checkerboard calibration targets.

Object-point grids and corner-order canonicalization, replacing the
reference's per-script object-point construction (reference:
stereo_calibration/scripts/intrinsic.py:235-280) and
``ensure_corner_ordering`` (reference: intrinsic.py:185-222), which flips
detected corner arrays so index 0 is the top-left corner — the property the
stereo pair matcher relies on (reference: extrinsic.py:275-282).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def checkerboard_object_points(
    cols: int, rows: int, square_size: float
) -> jnp.ndarray:
    """(cols*rows, 3) planar grid of inner-corner positions, z = 0.

    Ordering matches cv2.findChessboardCorners: row-major, x fastest.
    The reference's default board is 7x4 inner corners at 100 mm
    (intrinsic.py:452-467); calibrate_v* generations drift between 9x7 /
    9x6 and 25-30 mm squares (SURVEY.md §5), so the board is always an
    explicit argument here.
    """
    g = np.zeros((rows * cols, 3), np.float32)
    g[:, :2] = np.mgrid[0:cols, 0:rows].T.reshape(-1, 2)
    return jnp.asarray(g * square_size)


def canonical_corner_order(corners: jnp.ndarray, cols: int, rows: int) -> jnp.ndarray:
    """Flip a detected corner grid so corner 0 is top-left, row-major.

    Args:
      corners: (N, 2) detected corners (N = cols*rows) in detector order.

    Returns:
      (N, 2) corners with deterministic orientation: first corner is the
      lexicographically smallest (y, x); rows scan left-to-right.
    """
    g = corners.reshape(rows, cols, 2)
    # Flip vertically if the first row is below the last.
    flip_v = g[0, 0, 1] > g[-1, 0, 1]
    g = jnp.where(flip_v, g[::-1], g)
    # Flip horizontally if the first column is right of the last.
    flip_h = g[0, 0, 0] > g[0, -1, 0]
    g = jnp.where(flip_h, g[:, ::-1], g)
    return g.reshape(-1, 2)
