"""Stereo pose fusion: triangulation with single-camera recovery.

TPU rebuild of the reference's StereoPoseEstimator fusion core
(reference: stereo_calibration/scripts/3dpose.py:478-800):

- EMA temporal landmark filter, weight 0.7 on the current frame
  (3dpose.py:485-492),
- per-joint triangulation of the 13 key joints when both views see them
  (undistortPoints with P=K, then DLT — 3dpose.py:527-577),
- single-camera recovery when only one view sees a joint
  (3dpose.py:579-619): historical-depth back-projection blended 0.7/0.3
  with the historical position, falling back to anatomical-ratio
  estimation (3dpose.py:665-747),
- back-projection at known depth incl. the right-camera rigid transform
  (3dpose.py:621-663).

The whole 13-joint fusion for a frame is ONE jitted program: the visible
set triangulates as a batched DLT, and the recovery cascade unrolls
statically over the canonical joint order (the reference builds its pose
dict in that order, so later joints' anatomy estimates may use earlier
joints' results — preserved here).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.ops.distortion import undistort_points
from stereo_vision_tpu.ops.triangulate import triangulate_points
from stereo_vision_tpu.track.joints import JOINT_INDEX, MEDIAPIPE_INDICES, NUM_JOINTS

# Anatomical estimation table (3dpose.py:683-703):
# joint -> (ref_joint, ref_joint2 | None, ratio). With two references the
# estimate is ref + (ref2 - ref) * ratio; with one, the most recent history
# frame supplies the bone vector.
_ANATOMY_RULES: dict[str, tuple[str, str | None, float]] = {
    "left_elbow": ("left_shoulder", "left_wrist", 0.5),
    "right_elbow": ("right_shoulder", "right_wrist", 0.5),
    "left_wrist": ("left_elbow", "left_shoulder", 2.0),
    "right_wrist": ("right_elbow", "right_shoulder", 2.0),
    "left_knee": ("left_hip", "left_ankle", 0.5),
    "right_knee": ("right_hip", "right_ankle", 0.5),
    "left_ankle": ("left_knee", "left_hip", 2.0),
    "right_ankle": ("right_knee", "right_hip", 2.0),
    "left_shoulder": ("left_hip", "nose", 0.6),
    "right_shoulder": ("right_hip", "nose", 0.6),
    "left_hip": ("left_shoulder", None, 1.7),
    "right_hip": ("right_shoulder", None, 1.7),
}


@dataclasses.dataclass(frozen=True)
class StereoRig:
    """Calibrated stereo rig (left camera frame is the world frame).

    P1 = K1 [I|0], P2 = K2 [R|T] as the reference builds them
    (3dpose.py:156-160).
    """

    K1: np.ndarray
    d1: np.ndarray
    K2: np.ndarray
    d2: np.ndarray
    R: np.ndarray
    T: np.ndarray

    @property
    def P1(self) -> np.ndarray:
        return np.asarray(self.K1) @ np.hstack([np.eye(3), np.zeros((3, 1))])

    @property
    def P2(self) -> np.ndarray:
        return np.asarray(self.K2) @ np.hstack(
            [np.asarray(self.R), np.asarray(self.T).reshape(3, 1)]
        )

    def as_arrays(self):
        return (
            jnp.asarray(self.K1, jnp.float64),
            jnp.asarray(self.d1, jnp.float64),
            jnp.asarray(self.K2, jnp.float64),
            jnp.asarray(self.d2, jnp.float64),
            jnp.asarray(self.R, jnp.float64),
            jnp.asarray(self.T, jnp.float64).reshape(3),
            jnp.asarray(self.P1, jnp.float64),
            jnp.asarray(self.P2, jnp.float64),
        )


def extract_key_joints(landmarks: jnp.ndarray) -> jnp.ndarray:
    """(..., 33, C) MediaPipe landmarks -> (..., 13, C) key joints
    (3dpose.py:503-518)."""
    return jnp.asarray(landmarks)[..., MEDIAPIPE_INDICES, :]


@jax.jit
def ema_filter(current: jnp.ndarray, previous: jnp.ndarray, weight: float = 0.7) -> jnp.ndarray:
    """Weighted moving average, current weighted ``weight``
    (3dpose.py:485-492)."""
    return weight * current + (1.0 - weight) * previous


def _backproject(K, R, T, pt, depth, is_right):
    """Pixel + depth -> 3D in the left-camera frame (3dpose.py:621-663)."""
    x = (pt[0] - K[0, 2]) * depth / K[0, 0]
    y = (pt[1] - K[1, 2]) * depth / K[1, 1]
    p = jnp.stack([x, y, depth])
    p_right = R.T @ p - R.T @ T
    return jnp.where(is_right, p_right, p)


@functools.partial(jax.jit, static_argnames=("conf_threshold", "blend_alpha"))
def fuse_pose(
    left_xy: jnp.ndarray,
    left_conf: jnp.ndarray,
    right_xy: jnp.ndarray,
    right_conf: jnp.ndarray,
    history: jnp.ndarray,
    calib_arrays,
    conf_threshold: float = 0.65,
    blend_alpha: float = 0.7,
) -> jnp.ndarray:
    """Fuse one frame's stereo 2D keypoints into a (J, 3) pose.

    Args:
      left_xy, right_xy: (J, 2) pixel keypoints of the 13 key joints.
      left_conf, right_conf: (J,) visibilities.
      history: (H, J, 3) recent fused poses, most recent LAST; NaN = gap.
        Pass an all-NaN array when no history exists.
      calib_arrays: StereoRig.as_arrays().
      conf_threshold: visibility gate (reference default 0.65, 3dpose.py:70).
      blend_alpha: new/historical blend for depth recovery (3dpose.py:605).

    Returns:
      (J, 3) pose in mm with NaN for unrecoverable joints.
    """
    K1, d1, K2, d2, R, T, P1, P2 = calib_arrays
    J = left_xy.shape[0]

    lvis = left_conf > conf_threshold
    rvis = right_conf > conf_threshold

    # Batched triangulation of every joint (masked afterwards).
    lu = undistort_points(left_xy, K1, d1, P=K1)
    ru = undistort_points(right_xy, K2, d2, P=K2)
    tri = triangulate_points(P1, P2, lu, ru)  # (J, 3)

    # Historical-depth recovery: most recent finite sample per joint.
    hist_ok = jnp.isfinite(history).all(-1)  # (H, J)
    rev_ok = hist_ok[::-1]
    has_hist = jnp.any(rev_ok, axis=0)  # (J,)
    first = jnp.argmax(rev_ok, axis=0)  # (J,) index into reversed history
    hist_pos = history[::-1][first, jnp.arange(J)]  # (J, 3)
    hist_pos = jnp.nan_to_num(hist_pos)

    nan3 = jnp.full(3, jnp.nan, tri.dtype)
    pose = jnp.full((J, 3), jnp.nan, tri.dtype)

    for name, j in JOINT_INDEX.items():
        both = lvis[j] & rvis[j]
        one_cam = lvis[j] ^ rvis[j]
        is_right = rvis[j] & ~lvis[j]
        pt = jnp.where(is_right, right_xy[j], left_xy[j])
        K = jnp.where(is_right, 1.0, 0.0) * K2 + jnp.where(is_right, 0.0, 1.0) * K1

        # Method 1: historical depth + blend (3dpose.py:592-608).
        upd = _backproject(K, R, T, pt, hist_pos[j, 2], is_right)
        blended = blend_alpha * upd + (1.0 - blend_alpha) * hist_pos[j]
        rec = jnp.where(has_hist[j], blended, nan3)

        # Method 2: anatomical ratio on the partially built pose
        # (3dpose.py:665-747).
        if name in _ANATOMY_RULES:
            ref_name, ref2_name, ratio = _ANATOMY_RULES[name]
            ri = JOINT_INDEX[ref_name]
            ref_pos = pose[ri]
            ref_valid = jnp.isfinite(ref_pos).all()
            if ref2_name is not None:
                r2 = JOINT_INDEX[ref2_name]
                ref2_pos = pose[r2]
                ref2_valid = jnp.isfinite(ref2_pos).all()
                est = jnp.nan_to_num(ref_pos) + (
                    jnp.nan_to_num(ref2_pos) - jnp.nan_to_num(ref_pos)
                ) * ratio
                anat = _backproject(K, R, T, pt, est[2], is_right)
                anat_ok = ref_valid & ref2_valid
            else:
                anat_ok = jnp.asarray(False)
                anat = nan3
            # One-reference fallback via historical bone vector
            # (3dpose.py:728-744).
            hb_ok = jnp.any(hist_ok[:, j] & hist_ok[:, ri])
            hrev = jnp.argmax((hist_ok[:, j] & hist_ok[:, ri])[::-1])
            hj = jnp.nan_to_num(history[::-1][hrev, j])
            hr = jnp.nan_to_num(history[::-1][hrev, ri])
            bone = hj - hr
            est2 = jnp.nan_to_num(ref_pos) + bone
            anat2 = _backproject(K, R, T, pt, est2[2], is_right)
            anat = jnp.where(anat_ok, anat, jnp.where(ref_valid & hb_ok, anat2, nan3))
            rec = jnp.where(jnp.isfinite(rec).all(), rec, anat)

        val = jnp.where(both, tri[j], jnp.where(one_cam, rec, nan3))
        pose = pose.at[j].set(val)

    return pose


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_threshold",
        "blend_alpha",
        "smooth_window",
        "temporal_filter_weight",
    ),
)
def fuse_pose_sequence(
    left_landmarks: jnp.ndarray,
    right_landmarks: jnp.ndarray,
    calib_arrays,
    conf_threshold: float = 0.65,
    blend_alpha: float = 0.7,
    smooth_window: int = 5,
    temporal_filter_weight: float = 0.7,
) -> jnp.ndarray:
    """The full streaming tracker over a whole sequence as ONE device program.

    Time is the batch axis (reference hot loop: 3dpose.py:358-462 runs
    per-frame on host); the only true recurrences — the EMA landmark
    filter and the rolling pose history — ride a single ``lax.scan``.
    Bit-identical to running StereoPoseTracker.process_frame per frame
    (tested), without T host->device round-trips.

    Args:
      left_landmarks, right_landmarks: (T, 33, 4) [x, y, z, visibility].

    Returns:
      (T, 13, 3) fused poses in mm, NaN for unrecoverable joints.
    """
    lk_all = extract_key_joints(jnp.asarray(left_landmarks))
    rk_all = extract_key_joints(jnp.asarray(right_landmarks))
    dt = lk_all.dtype
    w = temporal_filter_weight

    def step(carry, inp):
        lprev, rprev, have_prev, hist = carry
        lk, rk = inp
        lk = jnp.where(have_prev, w * lk + (1.0 - w) * lprev, lk)
        rk = jnp.where(have_prev, w * rk + (1.0 - w) * rprev, rk)
        pose = fuse_pose(
            lk[:, :2],
            lk[:, 3],
            rk[:, :2],
            rk[:, 3],
            hist,
            calib_arrays,
            conf_threshold=conf_threshold,
            blend_alpha=blend_alpha,
        )
        # Rolling history, most recent LAST; NaN rows read as absent, so
        # the fixed-size NaN-padded buffer matches the growing host list.
        hist = jnp.concatenate([hist[1:], pose[None].astype(hist.dtype)], axis=0)
        return (lk, rk, jnp.asarray(True), hist), pose

    init = (
        jnp.zeros_like(lk_all[0]),
        jnp.zeros_like(rk_all[0]),
        jnp.asarray(False),
        jnp.full((smooth_window, NUM_JOINTS, 3), jnp.nan, dt),
    )
    _, poses = jax.lax.scan(step, init, (lk_all, rk_all))
    return poses


class StereoPoseTracker:
    """Stateful streaming tracker mirroring StereoPoseEstimator
    (3dpose.py:20-110 defaults: smooth_window=5, confidence 0.65,
    temporal filter weight 0.7)."""

    def __init__(
        self,
        rig: StereoRig,
        conf_threshold: float = 0.65,
        temporal_filter_weight: float = 0.7,
        smooth_window: int = 5,
    ):
        self.rig = rig
        self._calib = rig.as_arrays()
        self.conf_threshold = conf_threshold
        self.w = temporal_filter_weight
        self.smooth_window = smooth_window
        self._lm_prev: dict[str, np.ndarray] = {}
        self.pose_history: list[np.ndarray] = []

    def process_frame(
        self, left_landmarks: np.ndarray, right_landmarks: np.ndarray
    ) -> np.ndarray:
        """(33, 4) [x_px, y_px, z, visibility] per view -> (13, 3) pose."""
        lk = np.asarray(extract_key_joints(jnp.asarray(left_landmarks, jnp.float64)))
        rk = np.asarray(extract_key_joints(jnp.asarray(right_landmarks, jnp.float64)))
        if "left" in self._lm_prev:
            lk = np.asarray(ema_filter(jnp.asarray(lk), jnp.asarray(self._lm_prev["left"]), self.w))
            rk = np.asarray(ema_filter(jnp.asarray(rk), jnp.asarray(self._lm_prev["right"]), self.w))
        self._lm_prev = {"left": lk, "right": rk}

        if self.pose_history:
            hist = np.stack(self.pose_history[-self.smooth_window:])
        else:
            hist = np.full((1, NUM_JOINTS, 3), np.nan)

        pose = np.asarray(
            fuse_pose(
                jnp.asarray(lk[:, :2]),
                jnp.asarray(lk[:, 3]),
                jnp.asarray(rk[:, :2]),
                jnp.asarray(rk[:, 3]),
                jnp.asarray(hist),
                self._calib,
                conf_threshold=self.conf_threshold,
            )
        )
        self.pose_history.append(pose)
        if len(self.pose_history) > self.smooth_window:
            self.pose_history.pop(0)
        return pose
