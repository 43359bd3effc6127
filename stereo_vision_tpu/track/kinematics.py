"""Finite-difference kinematics and motion-event detection.

Behavioral parity with the reference:
- velocity/acceleration chains (reference: ball_drop.py:458-476,
  motion_smoothing.py:674-748),
- gravity estimation vs 9800 mm/s² (ball_drop.py:479-485),
- start-of-motion detection (ball_drop.py:261-295),
- theoretical drop velocity sqrt(2 g h) (ball_drop.py:571-580).

All differentiation is vectorized over the time axis — one jit program per
trajectory batch instead of the reference's per-frame Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GRAVITY_MM_S2 = 9800.0  # reference expectation (ball_drop.py:483)


@jax.jit
def finite_difference(x: jnp.ndarray, dt: jnp.ndarray | float) -> jnp.ndarray:
    """(T, ...) positions -> (T-1, ...) derivative, Δx / Δt.

    ``dt`` may be scalar or a (T,) timestamp vector (non-uniform sampling,
    as the reference's ffprobe timestamps produce).
    """
    dx = x[1:] - x[:-1]
    if jnp.ndim(dt) == 0:
        return dx / dt
    dts = dt[1:] - dt[:-1]
    return dx / dts.reshape((-1,) + (1,) * (x.ndim - 1))


def joint_velocities(seq: jnp.ndarray, time_delta: float = 1.0 / 30.0) -> jnp.ndarray:
    """(T, J, 3) -> (T-1, J, 3) velocities (motion_smoothing.py:674-712)."""
    return finite_difference(jnp.asarray(seq), time_delta)


def joint_accelerations(velocities: jnp.ndarray, time_delta: float = 1.0 / 30.0) -> jnp.ndarray:
    """(T-1, J, 3) -> (T-2, J, 3) accelerations (motion_smoothing.py:714-748)."""
    return finite_difference(jnp.asarray(velocities), time_delta)


def estimate_gravity(
    positions: np.ndarray,
    timestamps: np.ndarray,
    up_axis: int = 1,
    up_is_negative: bool = True,
    method: str = "fit",
) -> tuple[float, float]:
    """Vertical acceleration estimate and % error vs 9800 mm/s².

    method="fd" mirrors ball_drop.py:458-485's estimator: velocities then
    accelerations by finite differences, gravity = their mean along the
    vertical axis. (The reference's ``mean(-a[1])`` assumes a y-UP
    reconstruction — pass ``up_is_negative=False`` for that orientation;
    the default ``True`` is the y-grows-downward image/camera frame,
    where free fall has a_y = +g.) The mean
    of second differences telescopes to the 4 endpoint samples, so with
    detection noise sigma at frame rate f its error is ~2*sqrt(2)*sigma*f/T
    — at 240 fps and 1 px noise that exceeds g itself.

    method="fit" (default) is the numerically sound estimator the
    framework uses: least-squares quadratic fit of y(t), whose gravity
    std is ~sqrt(720)*sigma/(sqrt(N)*T^2) — two orders of magnitude
    tighter on the same data. Both honor the y-grows-downward convention.

    Returns:
      (gravity_mm_s2, error_percent).
    """
    p = jnp.asarray(positions, jnp.float64)
    t = jnp.asarray(timestamps, jnp.float64)
    if method == "fit":
        y = p[:, up_axis]
        ts = t - t[0]
        A = jnp.stack([ts * ts, ts, jnp.ones_like(ts)], axis=1)
        coef, *_ = jnp.linalg.lstsq(A, y)
        a_y = 2.0 * coef[0]
        # up_is_negative: the axis grows DOWNWARD (image/camera frames), so
        # a free fall has a_y = +g and gravity is reported as +a_y.
        g = float(a_y if up_is_negative else -a_y)
    else:
        v = finite_difference(p, t)
        a = finite_difference(v, t[1:])
        g_series = a[:, up_axis] if up_is_negative else -a[:, up_axis]
        g = float(jnp.mean(g_series))
    # Sign-robust error: the vertical axis orientation depends on the rig
    # (image frames are y-down; the reference's -a[1] convention flips sign
    # for y-up reconstructions) — the physics check is on the magnitude.
    err = abs(abs(g) - GRAVITY_MM_S2) / GRAVITY_MM_S2 * 100.0
    return g, err


def detect_start_of_motion(
    positions: np.ndarray,
    num_frames: int = 5,
    threshold: float = 5.0,
    axis: int = 1,
) -> int:
    """First frame before sustained vertical motion (ball_drop.py:261-295).

    Looks for ``num_frames`` consecutive |Δy| > threshold (returns the
    frame before the run), else the first single |Δy| > 2*threshold,
    else 0.
    """
    positions = np.asarray(positions)
    if len(positions) < num_frames + 1:
        return 0
    y = positions[:, axis]
    dy = np.abs(np.diff(y))
    # Vectorized run test: window-min of dy > threshold.
    if len(dy) >= num_frames:
        from numpy.lib.stride_tricks import sliding_window_view

        runs = sliding_window_view(dy, num_frames).min(axis=1) > threshold
        hits = np.flatnonzero(runs)
        if hits.size:
            return max(0, int(hits[0]) - 1)
    big = np.flatnonzero(dy > threshold * 2)
    if big.size:
        return int(big[0])
    return 0


def theoretical_drop_velocity(height_mm: float, g: float = GRAVITY_MM_S2) -> float:
    """sqrt(2 g h) — the reference's sanity check (ball_drop.py:571-580)."""
    return float(np.sqrt(2.0 * g * height_mm))
