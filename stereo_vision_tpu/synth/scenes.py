"""Synthetic scene renderers + training batch generators.

The reference's learned detectors come pretrained (ultralytics YOLOv8 at
ball_drop.py:817-823, MediaPipe Pose at 3dpose.py:330-341); this
zero-egress environment cannot download weights, so the framework trains
its own detectors on rendered scenes instead and ships the weights
in-repo (VERDICT round-1 item #4). This module is the data source: ball
scenes with known centers/boxes and stick-figure scenes with known
33-landmark ground truth, both single frames (training batches) and
calibrated stereo video sequences (end-to-end tests).

Rendering is host-side cv2/numpy by design (it replaces a dataset on
disk, not a compute kernel).
"""

from __future__ import annotations

import numpy as np

from stereo_vision_tpu.track.joints import JOINT_INDEX, KEY_JOINTS

# ---------------------------------------------------------------------------
# Backgrounds and balls
# ---------------------------------------------------------------------------


def textured_background(rng: np.random.Generator, H: int, W: int, sigma: float = 3.0) -> np.ndarray:
    """Blurred-noise RGB background (keeps detectors off trivial cues)."""
    import cv2

    img = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), sigma)
    lo, hi = rng.uniform(20, 60), rng.uniform(150, 235)
    img = cv2.normalize(img, None, lo, hi, cv2.NORM_MINMAX)
    return img.astype(np.uint8)


def draw_ball(img: np.ndarray, cx: float, cy: float, r: float, color=(255, 120, 30)) -> None:
    """Shaded ball: base disk + darker rim + specular highlight (in place)."""
    import cv2

    c = (int(round(cx)), int(round(cy)))
    ri = max(int(round(r)), 2)
    cv2.circle(img, c, ri, tuple(int(v) for v in color), -1, lineType=cv2.LINE_AA)
    rim = tuple(max(int(v * 0.55), 0) for v in color)
    cv2.circle(img, c, ri, rim, max(ri // 6, 1), lineType=cv2.LINE_AA)
    hi = (int(c[0] - ri * 0.3), int(c[1] - ri * 0.3))
    cv2.circle(img, hi, max(ri // 4, 1), (250, 250, 250), -1, lineType=cv2.LINE_AA)


def _letterbox_aug(rng, img: np.ndarray, pts: np.ndarray, p: float = 0.7):
    """Random letterbox: shrink content into the top-left corner, pad with
    the inference-time gray (114). Mimics what pretrained.py does to
    non-square video frames, so padded borders stay in-distribution.
    Returns (image, pts * s) — ``pts`` is any (..., 2) pixel-coord array.
    """
    import cv2

    if rng.uniform() > p:
        return img, pts
    H, W = img.shape[:2]
    s = rng.uniform(0.55, 0.95)
    Hr, Wr = max(int(round(H * s)), 8), max(int(round(W * s)), 8)
    out = np.full_like(img, 114)
    out[:Hr, :Wr] = cv2.resize(img, (Wr, Hr))
    return out, pts * np.array([Wr / W, Hr / H])


def ball_training_batch(
    rng: np.random.Generator, B: int, H: int = 128, W: int = 128
):
    """B rendered ball images + GT boxes for detection training.

    Returns (images float32 [B,H,W,3] in [0,1], boxes (B,1,4) xyxy px,
    classes (B,1) int32 zeros, valid (B,1) bool).
    """
    import cv2

    imgs = np.zeros((B, H, W, 3), np.float32)
    boxes = np.zeros((B, 1, 4), np.float32)
    for i in range(B):
        img = textured_background(rng, H, W)
        r = rng.uniform(2.5, min(H, W) / 5)
        cx = rng.uniform(r + 1, W - r - 1)
        cy = rng.uniform(r + 1, H - r - 1)
        # orange-dominant with variation (the reference's balls are orange,
        # single_cam_drop.py HSV filter), plus occasional off-color balls.
        base = np.array([255, 120, 30], np.float32)
        col = np.clip(base + rng.normal(0, 25, 3), 0, 255)
        draw_ball(img, cx, cy, r, col)
        corners = np.array([[cx - r, cy - r], [cx + r, cy + r]])
        img, corners = _letterbox_aug(rng, img, corners)
        # Match deployed conditions (video encode/decode + resize): mild
        # blur and sensor-ish noise, so tiny softened balls stay in-dist.
        fimg = img.astype(np.float32)
        sigma = rng.uniform(0.0, 1.2)
        if sigma > 0.05:
            fimg = cv2.GaussianBlur(fimg, (0, 0), sigma)
        fimg += rng.normal(0, rng.uniform(0, 6), fimg.shape).astype(np.float32)
        imgs[i] = np.clip(fimg, 0, 255) / 255.0
        boxes[i, 0] = corners.reshape(4)
    classes = np.zeros((B, 1), np.int32)
    valid = np.ones((B, 1), bool)
    return imgs, boxes, classes, valid


# ---------------------------------------------------------------------------
# Stereo projection helpers
# ---------------------------------------------------------------------------


def _project(P: np.ndarray, pts3d: np.ndarray) -> np.ndarray:
    """(N, 3) mm -> (N, 2) px through a 3x4 projection matrix."""
    ph = np.concatenate([pts3d, np.ones((len(pts3d), 1))], axis=1)
    uv = (P @ ph.T).T
    return uv[:, :2] / uv[:, 2:3]


def render_ball_drop_stereo(
    rig,
    T: int = 120,
    fps: float = 240.0,
    H: int = 240,
    W: int = 320,
    g_mm_s2: float = 9800.0,
    hold_frames: int = 20,
    start_mm=(0.0, -300.0, 2500.0),
    ball_radius_mm: float = 40.0,
    seed: int = 0,
):
    """Calibrated stereo ball-drop sequence with ground truth.

    The ball holds still for ``hold_frames`` then free-falls (y grows
    downward, matching track/ball.py). Returns (left_frames, right_frames,
    gt_left_px, gt_right_px, traj3d) with frames (T, H, W, 3) uint8.
    """
    rng = np.random.default_rng(seed)
    t = np.maximum(np.arange(T) - hold_frames, 0) / fps
    traj = np.tile(np.asarray(start_mm, np.float64), (T, 1))
    traj[:, 1] = start_mm[1] + 0.5 * g_mm_s2 * t**2

    P1, P2 = rig.P1, rig.P2
    uv_l = _project(P1, traj)
    uv_r = _project(P2, traj)
    f1 = rig.K1[0, 0]
    r_px_l = f1 * ball_radius_mm / traj[:, 2]
    r_px_r = rig.K2[0, 0] * ball_radius_mm / traj[:, 2]

    bg_l = textured_background(rng, H, W)
    bg_r = textured_background(rng, H, W)
    lf = np.zeros((T, H, W, 3), np.uint8)
    rf = np.zeros((T, H, W, 3), np.uint8)
    for i in range(T):
        a, b = bg_l.copy(), bg_r.copy()
        draw_ball(a, uv_l[i, 0], uv_l[i, 1], r_px_l[i])
        draw_ball(b, uv_r[i, 0], uv_r[i, 1], r_px_r[i])
        lf[i], rf[i] = a, b
    return lf, rf, uv_l, uv_r, traj


# ---------------------------------------------------------------------------
# Stick-figure bodies (33-landmark MediaPipe layout)
# ---------------------------------------------------------------------------

# MediaPipe landmark groups the 13 key joints don't cover: derive them
# from the key joints with fixed anatomical offsets (fractions of the
# shoulder width), enough for rendering + a consistent 33-point GT.
_FACE = {1: (-0.10, -0.12), 2: (-0.16, -0.12), 3: (-0.22, -0.12),
         4: (0.10, -0.12), 5: (0.16, -0.12), 6: (0.22, -0.12),
         7: (-0.35, 0.0), 8: (0.35, 0.0), 9: (-0.12, 0.18), 10: (0.12, 0.18)}
_HAND_L = {17: (-0.12, 0.10), 19: (-0.06, 0.16), 21: (-0.14, 0.0)}
_HAND_R = {18: (0.12, 0.10), 20: (0.06, 0.16), 22: (0.14, 0.0)}
_FOOT_L = {29: (-0.10, 0.10), 31: (0.12, 0.14)}
_FOOT_R = {30: (0.10, 0.10), 32: (-0.12, 0.14)}


def body33_from_key13(key13: np.ndarray) -> np.ndarray:
    """(13, 3) key joints (track order) -> (33, 3) MediaPipe-layout body."""
    out = np.zeros((33, 3), key13.dtype)
    shoulder_w = np.linalg.norm(
        key13[JOINT_INDEX["left_shoulder"]] - key13[JOINT_INDEX["right_shoulder"]]
    )
    s = shoulder_w if shoulder_w > 1e-6 else 1.0
    for name, mp_idx in KEY_JOINTS.items():
        out[mp_idx] = key13[JOINT_INDEX[name]]
    nose = key13[JOINT_INDEX["nose"]]
    for idx, (dx, dy) in _FACE.items():
        out[idx] = nose + np.array([dx * s, dy * s, 0.0])
    lw = key13[JOINT_INDEX["left_wrist"]]
    rw = key13[JOINT_INDEX["right_wrist"]]
    for idx, (dx, dy) in _HAND_L.items():
        out[idx] = lw + np.array([dx * s, dy * s, 0.0])
    for idx, (dx, dy) in _HAND_R.items():
        out[idx] = rw + np.array([dx * s, dy * s, 0.0])
    la = key13[JOINT_INDEX["left_ankle"]]
    ra = key13[JOINT_INDEX["right_ankle"]]
    for idx, (dx, dy) in _FOOT_L.items():
        out[idx] = la + np.array([dx * s, dy * s, 0.0])
    for idx, (dx, dy) in _FOOT_R.items():
        out[idx] = ra + np.array([dx * s, dy * s, 0.0])
    return out


_BASE13 = np.array(
    [
        [0, -650, 0],      # nose
        [-175, -450, 0],   # left_shoulder
        [175, -450, 0],    # right_shoulder
        [-320, -200, 0],   # left_elbow
        [320, -200, 0],    # right_elbow
        [-380, 30, 0],     # left_wrist
        [380, 30, 0],      # right_wrist
        [-125, 0, 0],      # left_hip
        [125, 0, 0],       # right_hip
        [-140, 400, 0],    # left_knee
        [140, 400, 0],     # right_knee
        [-150, 780, 0],    # left_ankle
        [150, 780, 0],     # right_ankle
    ],
    np.float64,
)

_LIMBS_MP = (
    (11, 13), (13, 15), (12, 14), (14, 16), (11, 12),
    (23, 24), (11, 23), (12, 24), (23, 25), (25, 27),
    (24, 26), (26, 28), (0, 11), (0, 12),
)


def random_pose13(rng: np.random.Generator) -> np.ndarray:
    """Randomized articulated 13-joint body in mm (y grows downward)."""
    body = _BASE13.copy()
    # articulate arms/legs: jitter elbows/wrists/knees/ankles
    for name in ("left_elbow", "right_elbow", "left_wrist", "right_wrist",
                 "left_knee", "right_knee", "left_ankle", "right_ankle"):
        body[JOINT_INDEX[name], :2] += rng.normal(0, 90, 2)
    body[:, :2] += rng.normal(0, 15, (13, 2))  # overall jitter
    scale = rng.uniform(0.8, 1.2)
    ang = rng.uniform(-0.35, 0.35)
    ca, sa = np.cos(ang), np.sin(ang)
    R = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
    body = (body * scale) @ R.T
    body[:, 2] += rng.uniform(2200, 4200)       # depth
    body[:, 0] += rng.uniform(-350, 350)
    body[:, 1] += rng.uniform(-250, 150)
    return body


def stick_figure_frame(
    H: int,
    W: int,
    lm_px: np.ndarray,
    background: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Render a stick figure from (33, 2) pixel landmarks."""
    import cv2

    rng = rng or np.random.default_rng(0)
    img = (background if background is not None else textured_background(rng, H, W)).copy()
    col_limb = (40, 40, 45)
    col_joint = (210, 60, 50)
    thick = max(int(round(H / 60)), 2)
    for a, b in _LIMBS_MP:
        pa, pb = lm_px[a], lm_px[b]
        if np.isfinite(pa).all() and np.isfinite(pb).all():
            cv2.line(img, tuple(np.round(pa).astype(int)),
                     tuple(np.round(pb).astype(int)), col_limb, thick, cv2.LINE_AA)
    # head disk around the nose
    nose = lm_px[0]
    sw = np.linalg.norm(lm_px[11] - lm_px[12])
    if np.isfinite(nose).all() and sw > 1:
        cv2.circle(img, tuple(np.round(nose).astype(int)), max(int(sw * 0.35), 3),
                   (200, 170, 140), -1, cv2.LINE_AA)
    for j in KEY_JOINTS.values():
        p = lm_px[j]
        if np.isfinite(p).all():
            cv2.circle(img, tuple(np.round(p).astype(int)), max(thick, 2),
                       col_joint, -1, cv2.LINE_AA)
    return img


def pose_training_batch(
    rng: np.random.Generator, B: int, H: int = 128, W: int = 128
):
    """B stick-figure images + normalized 33-landmark GT.

    Returns (images float32 [B,H,W,3] in [0,1], gt (B, 33, 4) with
    x,y in [0,1], z = 0, visibility 1 inside the frame / 0 outside).
    """
    f = 1.1 * max(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    P = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    imgs = np.zeros((B, H, W, 3), np.float32)
    gt = np.zeros((B, 33, 4), np.float32)
    import cv2

    for i in range(B):
        body = body33_from_key13(random_pose13(rng))
        uv = _project(P, body)
        inside = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        img = stick_figure_frame(H, W, uv, rng=rng)
        img, uv = _letterbox_aug(rng, img, uv)
        fimg = img.astype(np.float32)
        sigma = rng.uniform(0.0, 1.2)
        if sigma > 0.05:
            fimg = cv2.GaussianBlur(fimg, (0, 0), sigma)
        fimg += rng.normal(0, rng.uniform(0, 6), fimg.shape).astype(np.float32)
        imgs[i] = np.clip(fimg, 0, 255) / 255.0
        gt[i, :, 0] = uv[:, 0] / W
        gt[i, :, 1] = uv[:, 1] / H
        gt[i, :, 3] = inside.astype(np.float32)
    return imgs, gt


def render_pose_stereo(
    rig,
    T: int = 60,
    H: int = 240,
    W: int = 320,
    seed: int = 0,
):
    """Calibrated stereo stick-figure sequence with 3D ground truth.

    A smoothly drifting articulated body; returns (left_frames,
    right_frames, gt_body33_3d (T, 33, 3) mm).
    """
    rng = np.random.default_rng(seed)
    base = random_pose13(rng)
    drift = np.array([rng.uniform(-200, 200), rng.uniform(-100, 100), 0.0])
    P1, P2 = rig.P1, rig.P2
    bgl = textured_background(rng, H, W)
    bgr = textured_background(rng, H, W)
    lf = np.zeros((T, H, W, 3), np.uint8)
    rf = np.zeros((T, H, W, 3), np.uint8)
    gt = np.zeros((T, 33, 3))
    tt = np.linspace(0, 1, T)
    for i in range(T):
        body13 = base + drift * tt[i]
        # gentle arm swing
        swing = 60.0 * np.sin(2 * np.pi * tt[i])
        body13 = body13.copy()
        body13[JOINT_INDEX["left_wrist"], 1] += swing
        body13[JOINT_INDEX["right_wrist"], 1] -= swing
        body33 = body33_from_key13(body13)
        gt[i] = body33
        lf[i] = stick_figure_frame(H, W, _project(P1, body33), background=bgl, rng=rng)
        rf[i] = stick_figure_frame(H, W, _project(P2, body33), background=bgr, rng=rng)
    return lf, rf, gt
