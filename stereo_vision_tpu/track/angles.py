"""3D joint angles.

Parity with the reference's angle calculator (reference: 3dpose.py:802-890):
8 named angles, each the arccos of normalized (a-b)·(c-b). Here all angles
of all frames compute in one vectorized program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.track.joints import ANGLE_NAMES, ANGLE_TRIPLE_INDICES


@jax.jit
def angle_3d(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Angle at vertex b between rays b->a and b->c, degrees (broadcasts).

    Matches calculate_angle_3d (3dpose.py:871-890) including the dot-product
    clamp to [-1, 1].
    """
    ba = a - b
    bc = c - b
    ban = ba / jnp.maximum(jnp.linalg.norm(ba, axis=-1, keepdims=True), 1e-12)
    bcn = bc / jnp.maximum(jnp.linalg.norm(bc, axis=-1, keepdims=True), 1e-12)
    d = jnp.clip(jnp.sum(ban * bcn, axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(d))


@jax.jit
def pose_angles(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., J, 3) poses -> (..., 8) joint angles in ANGLE_NAMES order.

    Angles whose joints are missing (NaN) propagate NaN, mirroring the
    reference's skip-if-absent behavior (3dpose.py:808-869).
    """
    idx = jnp.asarray(ANGLE_TRIPLE_INDICES)
    a = pose[..., idx[:, 0], :]
    b = pose[..., idx[:, 1], :]
    c = pose[..., idx[:, 2], :]
    return angle_3d(a, b, c)


def pose_angles_dict(pose: np.ndarray) -> dict[str, float]:
    """Single-pose convenience returning the reference's {name: degrees}
    dict, omitting angles with missing joints."""
    vals = np.asarray(pose_angles(jnp.asarray(pose)))
    return {n: float(v) for n, v in zip(ANGLE_NAMES, vals) if np.isfinite(v)}
