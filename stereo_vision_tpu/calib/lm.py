"""Levenberg-Marquardt least squares in JAX.

The solver behind calibrate_camera / calibrate_stereo — the TPU-native
replacement for the LM loop inside cv2.calibrateCamera /
cv2.stereoCalibrate (reference: stereo_calibration/scripts/intrinsic.py:289,
extrinsic.py:430). The whole optimization is one jitted
``lax.while_loop``: the residual Jacobian comes from ``jax.jacfwd``, the
normal equations are solved densely (calibration problems are a few
hundred parameters), and the damping schedule follows the classic
multiplicative rule.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from stereo_vision_tpu.utils.precision import highest_precision


class LMResult(NamedTuple):
    params: jnp.ndarray   # optimized parameter vector
    cost: jnp.ndarray     # final 0.5 * sum(r^2)
    iterations: jnp.ndarray
    lam: jnp.ndarray      # final damping


@highest_precision
def levenberg_marquardt(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iters: int = 60,
    lam0: float = 1e-3,
    lam_up: float = 10.0,
    lam_down: float = 0.1,
    lam_max: float = 1e10,
    rtol: float = 1e-12,
    mask: jnp.ndarray | None = None,
) -> LMResult:
    """Minimize 0.5 * ||residual_fn(x)||^2 over x.

    Args:
      residual_fn: maps (P,) params to (N,) residuals. Must be traceable.
      x0: (P,) initial parameters.
      mask: optional (P,) {0,1} — zero entries are frozen (the FIX_* flag
        mechanism of cv2 calibration, e.g. CALIB_FIX_K4..K6 in the
        reference's iPhone setup, intrinsic.py:282-285).

    Returns:
      LMResult. Runs a fixed-structure lax.while_loop — fully jittable.
    """
    x0 = jnp.asarray(x0)
    P = x0.shape[0]
    if mask is None:
        mask = jnp.ones_like(x0)
    mask = jnp.asarray(mask, x0.dtype)

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def step(state):
        x, lam, cost, it, done = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)  # (N, P)
        J = J * mask[None, :]
        JtJ = J.T @ J
        g = J.T @ r
        damped = JtJ + lam * jnp.diag(jnp.diagonal(JtJ) + 1e-12)
        # Frozen params: identity rows to keep the solve well-posed.
        frozen = 1.0 - mask
        damped = damped + jnp.diag(frozen)
        dx = -jnp.linalg.solve(damped, g[:, None])[:, 0] * mask
        x_new = x + dx
        new_cost = cost_of(x_new)
        improved = new_cost < cost
        x = jnp.where(improved, x_new, x)
        lam = jnp.where(improved, jnp.maximum(lam * lam_down, 1e-12), lam * lam_up)
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = (improved & (rel < rtol)) | (lam > lam_max)
        cost = jnp.where(improved, new_cost, cost)
        return (x, lam, cost, it + 1, done)

    def cond(state):
        _, _, _, it, done = state
        return (~done) & (it < max_iters)

    init = (x0, jnp.asarray(lam0, x0.dtype), cost_of(x0), jnp.asarray(0), jnp.asarray(False))
    x, lam, cost, it, _ = jax.lax.while_loop(cond, step, init)
    return LMResult(x, cost, it, lam)
