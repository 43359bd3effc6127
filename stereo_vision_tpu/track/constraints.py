"""Anatomical and velocity constraints over pose sequences.

Behavioral parity with the reference:
- sequence-level limb averaging with the 10-600 mm plausibility gate
  (reference: motion_smoothing.py:489-537),
- midpoint-preserving limb rescale when |len - ref|/ref > tolerance
  (motion_smoothing.py:566-627),
- velocity constraint replacing outlier frames with the prev/next
  midpoint (motion_smoothing.py:629-672),
- the per-frame bone-length constraint of the pose estimator, which pins
  joint1 at joint2 + unit*ref_len when deviation exceeds 20%
  (3dpose.py:752-800).

Poses are (T, J, 3) arrays with NaN gaps. Each constraint is one jitted
program: frames are a batch axis; the 12 limb pairs apply as a static
unrolled chain (their order is semantic — later pairs see earlier pairs'
corrections, exactly as the reference's sequential dict updates do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.track.joints import (
    DEFAULT_LIMB_LENGTH_VEC,
    LIMB_PAIR_INDICES,
)

_PAIRS = tuple((int(a), int(b)) for a, b in LIMB_PAIR_INDICES)


@jax.jit
def _average_limb_lengths(seq: jnp.ndarray) -> jnp.ndarray:
    """(P,) mean limb length over frames where both joints are finite and
    the length is in (10, 600) mm; NaN where nothing qualifies
    (motion_smoothing.py:489-537)."""
    a = seq[:, LIMB_PAIR_INDICES[:, 0]]  # (T, P, 3)
    b = seq[:, LIMB_PAIR_INDICES[:, 1]]
    d = jnp.linalg.norm(jnp.nan_to_num(a - b), axis=-1)
    finite = jnp.isfinite(a).all(-1) & jnp.isfinite(b).all(-1)
    ok = finite & (d > 10.0) & (d < 600.0)
    s = jnp.sum(jnp.where(ok, d, 0.0), axis=0)
    n = jnp.sum(ok, axis=0)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def average_limb_lengths(seq: np.ndarray) -> np.ndarray:
    """Host wrapper returning a (P,) numpy vector aligned to LIMB_PAIRS."""
    return np.asarray(_average_limb_lengths(jnp.asarray(seq, jnp.float64)))


@jax.jit
def _anatomical_constraints(seq: jnp.ndarray, ref: jnp.ndarray, tolerance: jnp.ndarray):
    """Midpoint-preserving limb rescale, frames batched, pairs in order."""
    count = jnp.zeros((), jnp.int32)
    for p, (i, j) in enumerate(_PAIRS):
        ref_len = ref[p]
        a = seq[:, i]  # (T, 3)
        b = seq[:, j]
        vec = b - a
        cur = jnp.linalg.norm(jnp.nan_to_num(vec), axis=-1)  # (T,)
        valid = (
            jnp.isfinite(a).all(-1)
            & jnp.isfinite(b).all(-1)
            & jnp.isfinite(ref_len)
            & (cur > 1e-9)
        )
        need = valid & (jnp.abs(cur - ref_len) / jnp.maximum(ref_len, 1e-9) > tolerance)
        unit = vec / jnp.maximum(cur, 1e-9)[:, None]
        mid = (a + b) * 0.5
        new_a = mid - unit * (ref_len * 0.5)
        new_b = mid + unit * (ref_len * 0.5)
        m = need[:, None]
        seq = seq.at[:, i].set(jnp.where(m, new_a, a))
        seq = seq.at[:, j].set(jnp.where(m, new_b, b))
        count = count + jnp.sum(need).astype(jnp.int32)
    return seq, count


def apply_anatomical_constraints_sequence(
    seq: np.ndarray,
    reference_lengths: np.ndarray | None = None,
    tolerance: float = 0.05,
) -> tuple[np.ndarray, int]:
    """Limb-length constraints over a (T, J, 3) sequence.

    Args:
      reference_lengths: (P,) lengths aligned to LIMB_PAIRS (NaN = skip
        pair). None measures them from the sequence itself; pairs with no
        valid measurement fall back to the default anthropometry table
        (motion_smoothing.py:585-600).

    Returns:
      (constrained sequence, number of corrections).
    """
    seq = jnp.asarray(seq, jnp.float64)
    if reference_lengths is None:
        measured = _average_limb_lengths(seq)
        ref = jnp.where(
            jnp.isfinite(measured), measured, jnp.asarray(DEFAULT_LIMB_LENGTH_VEC)
        )
    else:
        ref = jnp.asarray(reference_lengths, jnp.float64)
    out, n = _anatomical_constraints(seq, ref, jnp.float64(tolerance))
    return np.asarray(out), int(n)


@functools.partial(jax.jit, static_argnames=())
def _velocity_constraints(seq: jnp.ndarray, threshold: jnp.ndarray):
    """Midpoint replacement of velocity outliers (motion_smoothing.py:629-672).

    The reference walks frames sequentially, so frame i's correction uses
    the *already corrected* frame i-1 and the *original* frame i+1 — a
    ``lax.scan`` carry over time with the original next-frame as input.
    """
    T = seq.shape[0]

    def step(prev_corr, xs):
        curr, nxt = xs
        v_prev = jnp.linalg.norm(jnp.nan_to_num(curr - prev_corr), axis=-1)
        v_next = jnp.linalg.norm(jnp.nan_to_num(nxt - curr), axis=-1)
        valid = (
            jnp.isfinite(prev_corr).all(-1)
            & jnp.isfinite(curr).all(-1)
            & jnp.isfinite(nxt).all(-1)
        )
        need = valid & ((v_prev > threshold) | (v_next > threshold))
        corrected = jnp.where(need[:, None], (prev_corr + nxt) * 0.5, curr)
        return corrected, (corrected, jnp.sum(need).astype(jnp.int32))

    _, (mid_frames, counts) = jax.lax.scan(step, seq[0], (seq[1 : T - 1], seq[2:]))
    out = jnp.concatenate([seq[:1], mid_frames, seq[T - 1 :]], axis=0)
    return out, jnp.sum(counts)


def apply_velocity_constraints(
    seq: np.ndarray, velocity_threshold: float = 50.0
) -> tuple[np.ndarray, int]:
    """Velocity-outlier midpoint replacement over a (T, J, 3) sequence.

    Returns (constrained sequence, number of corrections); sequences
    shorter than 3 frames pass through (motion_smoothing.py:643-645).
    """
    seq = np.asarray(seq, np.float64)
    if seq.shape[0] < 3:
        return seq, 0
    out, n = _velocity_constraints(jnp.asarray(seq), jnp.float64(velocity_threshold))
    return np.asarray(out), int(n)


@jax.jit
def _bone_length_single(pose: jnp.ndarray, ref_pose: jnp.ndarray, max_dev: jnp.ndarray):
    """Per-frame bone constraint (3dpose.py:752-800): when the current limb
    deviates >20% from the previous frame's length, move joint1 to
    joint2 + unit * ref_length (joint2 anchored, unlike the smoother)."""
    pose = pose.astype(jnp.float64)
    count = jnp.zeros((), jnp.int32)
    # Reference limb set excludes the torso diagonals (3dpose.py:760-771).
    for i, j in _PAIRS[:10]:
        ref_vec = ref_pose[i] - ref_pose[j]
        ref_len = jnp.linalg.norm(jnp.nan_to_num(ref_vec))
        cur_vec = pose[i] - pose[j]
        cur_len = jnp.linalg.norm(jnp.nan_to_num(cur_vec))
        valid = (
            jnp.isfinite(pose[i]).all()
            & jnp.isfinite(pose[j]).all()
            & jnp.isfinite(ref_pose[i]).all()
            & jnp.isfinite(ref_pose[j]).all()
            & (cur_len > 1e-9)
            & (ref_len > 1e-9)
        )
        need = valid & (jnp.abs(cur_len - ref_len) / jnp.maximum(ref_len, 1e-9) > max_dev)
        unit = cur_vec / jnp.maximum(cur_len, 1e-9)
        new_i = pose[j] + unit * ref_len
        pose = pose.at[i].set(jnp.where(need, new_i, pose[i]))
        count = count + need.astype(jnp.int32)
    return pose, count


def apply_bone_length_constraints(
    pose: np.ndarray, reference_pose: np.ndarray, max_deviation: float = 0.2
) -> tuple[np.ndarray, int]:
    """Per-frame bone-length constraint vs the previous frame
    (3dpose.py:752-800 semantics, ±20% default)."""
    out, n = _bone_length_single(
        jnp.asarray(pose), jnp.asarray(reference_pose), jnp.float64(max_deviation)
    )
    return np.asarray(out), int(n)
