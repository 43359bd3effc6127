"""Motion smoothing: Savitzky-Golay as convolution, moving average,
One-Euro as a scan, and the MotionSmoother orchestration.

Behavioral parity with the reference's MotionSmoother
(reference: stereo_calibration/scripts/motion_smoothing.py:15-761):

- PRESET_CONFIGS for the three camera types (motion_smoothing.py:22-44).
- Savitzky-Golay with scipy's default 'interp' edge mode
  (motion_smoothing.py:289-349). Savgol is a fixed FIR filter plus two
  small polynomial-fit edge operators — here the interior taps run as one
  time-axis convolution over all (joint, axis) trajectories at once and
  the edges as two tiny matmuls, so a whole sequence smooths in a single
  device program instead of scipy's per-series C call.
- Moving average with original-value edge fill (motion_smoothing.py:351-379).
- One-Euro filter as a ``lax.scan`` carry (motion_smoothing.py:381-454).
- Sequence orchestration: filter -> anatomical constraints (reference
  lengths measured *before* smoothing) -> velocity constraints
  (motion_smoothing.py:82-138), with the same stats counters.

NaN-gap handling mirrors the reference: series containing NaN are
compressed to their valid samples, filtered, and scattered back
(motion_smoothing.py:300-339); that data-dependent path runs on host,
while fully-valid series (the common case) run batched on device.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.track.constraints import (
    apply_anatomical_constraints_sequence,
    apply_velocity_constraints,
    average_limb_lengths,
)

PRESET_CONFIGS: dict[str, dict[str, Any]] = {
    # 30 fps iPhone (motion_smoothing.py:24-30)
    "smalliphone": {
        "window_size": 9,
        "poly_order": 2,
        "limb_length_tolerance": 0.05,
        "velocity_threshold": 50.0,
        "smoothing_method": "savgol",
    },
    # 60 fps iPhone (motion_smoothing.py:31-37)
    "iphone": {
        "window_size": 13,
        "poly_order": 3,
        "limb_length_tolerance": 0.04,
        "velocity_threshold": 80.0,
        "smoothing_method": "savgol",
    },
    # Edgertronic 480 fps (motion_smoothing.py:38-44)
    "edger": {
        "window_size": 31,
        "poly_order": 3,
        "limb_length_tolerance": 0.03,
        "velocity_threshold": 100.0,
        "smoothing_method": "savgol",
    },
}


def savgol_coefficients(window: int, polyorder: int) -> np.ndarray:
    """Central Savitzky-Golay FIR taps (identical to scipy.signal.savgol_coeffs
    with use='conv' reversed, i.e. correlation order)."""
    if window % 2 == 0:
        raise ValueError("window must be odd")
    half = window // 2
    pos = np.arange(-half, half + 1, dtype=np.float64)
    V = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    # Least-squares fit evaluated at the center: row 0 of pinv(V).
    return np.linalg.pinv(V)[0]


def _savgol_edge_operator(window: int, polyorder: int) -> np.ndarray:
    """(half, window) operator: polynomial fit over the first ``window``
    samples evaluated at positions 0..half-1 (scipy mode='interp')."""
    half = window // 2
    pos = np.arange(window, dtype=np.float64)
    V = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    P = np.linalg.pinv(V)  # (p+1, window)
    E = pos[:half, None] ** np.arange(polyorder + 1)[None, :]  # (half, p+1)
    return E @ P


def savgol_filter_time(x: jnp.ndarray, window: int, polyorder: int) -> jnp.ndarray:
    """Savitzky-Golay along axis 0 (time), scipy 'interp' edge semantics.

    Args:
      x: (T, ...) trajectories; T >= window.

    Interior samples are one grouped convolution over the flattened
    feature axes; the first/last half-window samples come from the edge
    polynomial-fit operators (two small matmuls).
    """
    if window % 2 == 0:
        window += 1  # reference oddness fix-up (motion_smoothing.py:323-325)
    taps = jnp.asarray(savgol_coefficients(window, polyorder))
    E = jnp.asarray(_savgol_edge_operator(window, polyorder))
    half = window // 2

    shape = x.shape
    T = shape[0]
    xf = x.reshape(T, -1).astype(jnp.float64 if x.dtype == jnp.float64 else jnp.float32)
    taps = taps.astype(xf.dtype)
    E = E.astype(xf.dtype)

    # Interior: correlation with the symmetric taps ('valid'), all series at
    # once via one conv with feature axes folded into the batch dim.
    mid = jax.vmap(
        lambda s: jnp.convolve(s, taps[::-1], mode="valid"), in_axes=1, out_axes=1
    )(xf)  # (T - window + 1, F)

    head = E @ xf[:window]            # (half, F)
    tail = (E @ xf[::-1][:window])[::-1]  # (half, F)
    out = jnp.concatenate([head, mid, tail], axis=0)
    return out.reshape(shape)


def moving_average_time(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Centered moving average along axis 0 with the reference's edge rule:
    the first/last half-window samples keep their original values
    (motion_smoothing.py:368-379)."""
    shape = x.shape
    T = shape[0]
    xf = x.reshape(T, -1).astype(jnp.float32 if x.dtype != jnp.float64 else jnp.float64)
    kernel = jnp.ones(window, xf.dtype) / window
    sm = jax.vmap(lambda s: jnp.convolve(s, kernel, mode="same"), in_axes=1, out_axes=1)(xf)
    half = window // 2
    idx = jnp.arange(T)[:, None]
    keep = (idx < half) | (idx >= T - half)
    out = jnp.where(keep, xf, sm)
    return out.reshape(shape)


def one_euro_filter_time(
    x: jnp.ndarray, min_cutoff: float = 1.0, beta: float = 0.1
) -> jnp.ndarray:
    """One-Euro filter along axis 0 (reference formula with dt = 1 frame,
    motion_smoothing.py:405-449): cutoff = min_cutoff + beta*|dx|,
    alpha = 1 / (1 + 1/cutoff), y = alpha*x + (1-alpha)*y_prev."""
    shape = x.shape
    xf = x.reshape(shape[0], -1)

    def step(carry, xi):
        prev_val, prev_filt = carry
        dx = xi - prev_val
        cutoff = min_cutoff + beta * jnp.abs(dx)
        alpha = 1.0 / (1.0 + 1.0 / cutoff)
        yi = alpha * xi + (1.0 - alpha) * prev_filt
        return (xi, yi), yi

    (_, _), ys = jax.lax.scan(step, (xf[0], xf[0]), xf[1:])
    out = jnp.concatenate([xf[:1], ys], axis=0)
    return out.reshape(shape)


def _filter_with_nan_gaps(series: np.ndarray, window: int, polyorder: int, method: str) -> np.ndarray:
    """Reference NaN policy (motion_smoothing.py:300-339): compress valid
    samples, filter, scatter back; leave untouched if too few samples."""
    valid = np.isfinite(series)
    out = series.copy()
    if valid.all():
        dense = series
        idx = None
    else:
        if valid.sum() < window:
            return out
        idx = np.flatnonzero(valid)
        dense = series[idx]
    dense_j = jnp.asarray(dense)
    if method == "savgol":
        sm = np.asarray(savgol_filter_time(dense_j, window, polyorder))
    elif method == "moving_average":
        sm = np.asarray(moving_average_time(dense_j, window))
    elif method == "one_euro":
        sm = np.asarray(one_euro_filter_time(dense_j))
    else:
        raise ValueError(f"unknown smoothing method: {method}")
    if idx is None:
        return sm
    out[idx] = sm
    return out


class MotionSmoother:
    """Drop-in parity surface for the reference MotionSmoother
    (motion_smoothing.py:15-761), operating on (T, J, 3) arrays."""

    PRESET_CONFIGS = PRESET_CONFIGS

    def __init__(self, preset: str = "smalliphone", **kwargs: Any):
        self.config = dict(self.PRESET_CONFIGS.get(preset, self.PRESET_CONFIGS["smalliphone"]))
        self.config.update(kwargs)
        self.pose_history: list[np.ndarray] = []
        self.reference_limb_lengths: np.ndarray | None = None
        self.stats = self._fresh_stats()

    @staticmethod
    def _fresh_stats() -> dict[str, float]:
        return {
            "frames_processed": 0,
            "anatomical_corrections": 0,
            "velocity_corrections": 0,
            "processing_time": 0.0,
        }

    def reset(self) -> None:
        self.pose_history = []
        self.reference_limb_lengths = None
        self.stats = self._fresh_stats()

    def get_stats(self) -> dict[str, float]:
        return self.stats

    # -- filtering ---------------------------------------------------------

    def _smooth_trajectories(self, seq: np.ndarray) -> np.ndarray:
        """Filter every (joint, axis) trajectory of a (T, J, 3) sequence."""
        window = self.config["window_size"]
        if window % 2 == 0:
            window += 1
        poly = self.config["poly_order"]
        method = self.config["smoothing_method"]
        T = seq.shape[0]
        flat = seq.reshape(T, -1)
        if np.isfinite(flat).all():
            if method == "savgol":
                return np.asarray(savgol_filter_time(jnp.asarray(seq), window, poly))
            if method == "moving_average":
                return np.asarray(moving_average_time(jnp.asarray(seq), window))
            if method == "one_euro":
                return np.asarray(one_euro_filter_time(jnp.asarray(seq)))
            raise ValueError(f"unknown smoothing method: {method}")
        out = np.empty_like(flat)
        for k in range(flat.shape[1]):
            out[:, k] = _filter_with_nan_gaps(flat[:, k], window, poly, method)
        return out.reshape(seq.shape)

    # -- orchestration (motion_smoothing.py:82-138) --------------------------

    def smooth_pose_sequence(self, pose_sequence: np.ndarray) -> np.ndarray:
        """Filter + anatomical + velocity constraints over a (T, J, 3) array.

        Matches the reference pipeline order: reference limb lengths are
        measured on the *unsmoothed* sequence (motion_smoothing.py:114-116),
        then filtering, then anatomical, then velocity constraints.
        """
        seq = np.asarray(pose_sequence, np.float64)
        start = time.time()
        self.stats = self._fresh_stats()

        if seq.shape[0] < self.config["window_size"]:
            return seq  # too short (motion_smoothing.py:103-107)

        ref_lengths = average_limb_lengths(seq)
        self.reference_limb_lengths = ref_lengths

        smoothed = self._smooth_trajectories(seq)

        smoothed, n_anat = apply_anatomical_constraints_sequence(
            smoothed, ref_lengths, tolerance=self.config["limb_length_tolerance"]
        )
        smoothed, n_vel = apply_velocity_constraints(
            smoothed, velocity_threshold=self.config["velocity_threshold"]
        )

        self.stats["frames_processed"] = int(seq.shape[0])
        self.stats["anatomical_corrections"] = int(n_anat)
        self.stats["velocity_corrections"] = int(n_vel)
        self.stats["processing_time"] = time.time() - start
        return smoothed

    def smooth_single_pose(self, pose: np.ndarray, pose_history: list[np.ndarray] | None = None) -> np.ndarray:
        """Streaming variant (motion_smoothing.py:140-171): smooth the
        trailing window once enough history exists, else just apply the
        anatomical constraints with default anthropometry."""
        if pose_history is not None:
            self.pose_history = list(pose_history)
        self.pose_history.append(np.asarray(pose, np.float64))
        w = self.config["window_size"]
        if len(self.pose_history) >= w:
            window = np.stack(self.pose_history[-w:])
            return self.smooth_pose_sequence(window)[-1]
        constrained, n = apply_anatomical_constraints_sequence(
            np.asarray(pose, np.float64)[None],
            None,
            tolerance=self.config["limb_length_tolerance"],
        )
        self.stats["anatomical_corrections"] += int(n)
        return constrained[0]
