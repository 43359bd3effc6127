"""Full-stack CLI integration: render synthetic checkerboard videos, then
run the intrinsic -> extrinsic -> rectify pipeline through the CLI exactly
as a user would, verifying recovered calibration against ground truth.

This exercises video IO (decode), corner detection, the LM solvers, gates
and the on-disk artifact schema in one pass — the reference's
SCRIPT_RUNNER workflow end to end (SURVEY.md §3.1-3.2).
"""

import json

import cv2
import numpy as np
import pytest

from stereo_vision_tpu.io.video import write_video
from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
from stereo_vision_tpu.pipeline.cli import main

COLS, ROWS, SQ = 7, 4, 60.0  # reference default board geometry
SIZE = (640, 400)
K_TRUE = np.array([[520.0, 0, 320.0], [0, 520.0, 200.0], [0, 0, 1.0]])
R_TRUE = cv2.Rodrigues(np.array([0.01, -0.06, 0.005]))[0]
T_TRUE = np.array([-90.0, 2.0, 4.0])


def _board_image(px_per_square=60):
    w = (COLS + 1) * px_per_square
    h = (ROWS + 1) * px_per_square
    img = np.full((h, w), 255, np.uint8)
    for i in range(ROWS + 1):
        for j in range(COLS + 1):
            if (i + j) % 2 == 0:
                img[i * px_per_square:(i + 1) * px_per_square,
                    j * px_per_square:(j + 1) * px_per_square] = 0
    # object-frame coordinates of the rendered board plane (mm):
    # inner corner (0,0) sits one square in from the top-left.
    return img


def _render_frame(K, rvec, tvec, px_per_square=60):
    """Warp the canonical board into the camera view for pose (rvec, tvec)."""
    board = _board_image(px_per_square)
    # plane-to-image homography: board pixel (u,v) -> mm (u/px*SQ - SQ, ...)
    s = SQ / px_per_square
    A = np.array([[s, 0, -SQ], [0, s, -SQ], [0, 0, 1.0]])  # px -> board mm
    R = cv2.Rodrigues(np.asarray(rvec, np.float64))[0]
    H = K @ np.column_stack([R[:, 0], R[:, 1], np.asarray(tvec, np.float64)]) @ A
    frame = cv2.warpPerspective(board, H / H[2, 2], SIZE, borderValue=180)
    return frame


def _poses(seed, n):
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        rvec = rng.uniform(-0.25, 0.25, 3)
        tvec = np.array(
            [rng.uniform(-180, 60), rng.uniform(-120, 40), rng.uniform(700, 1200)]
        )
        # board must land fully inside the frame with margin
        obj = np.array(
            [[j * SQ, i * SQ, 0] for i in range(-1, ROWS + 1) for j in range(-1, COLS + 1)]
        )
        R = cv2.Rodrigues(rvec)[0]
        cam = obj @ R.T + tvec
        px = (K_TRUE @ (cam / cam[:, 2:]).T).T[:, :2]
        if (px > 12).all() and (px[:, 0] < SIZE[0] - 12).all() and (px[:, 1] < SIZE[1] - 12).all():
            out.append((rvec, tvec))
    return out


@pytest.fixture(scope="module")
def test_dir(tmp_path_factory):
    """Render left/right intrinsic + extrinsic videos into the reference
    test-dir convention."""
    root = tmp_path_factory.mktemp("testdir")
    vids = root / "videos"
    poses = _poses(1, 14)
    frames_l = np.stack([_render_frame(K_TRUE, rv, tv) for rv, tv in poses])
    write_video(vids / "left_intrinsic.mp4", frames_l, fps=5)
    poses_r = _poses(2, 14)
    frames_r = np.stack([_render_frame(K_TRUE, rv, tv) for rv, tv in poses_r])
    write_video(vids / "right_intrinsic.mp4", frames_r, fps=5)

    # extrinsic: SAME board poses seen by both cameras of the rig
    ext_poses = []
    rng = np.random.default_rng(3)
    while len(ext_poses) < 10:
        rvec = rng.uniform(-0.2, 0.2, 3)
        tvec = np.array([rng.uniform(-120, 30), rng.uniform(-90, 20), rng.uniform(750, 1150)])
        ok = True
        for K, R0, T0 in ((K_TRUE, np.eye(3), np.zeros(3)), (K_TRUE, R_TRUE, T_TRUE)):
            R = R0 @ cv2.Rodrigues(rvec)[0]
            t = R0 @ tvec + T0
            obj = np.array(
                [[j * SQ, i * SQ, 0] for i in range(-1, ROWS + 1) for j in range(-1, COLS + 1)]
            )
            cam = obj @ R.T + t
            px = (K @ (cam / cam[:, 2:]).T).T[:, :2]
            if not ((px > 12).all() and (px[:, 0] < SIZE[0] - 12).all() and (px[:, 1] < SIZE[1] - 12).all()):
                ok = False
        if ok:
            ext_poses.append((rvec, tvec))
    fl, fr = [], []
    for rvec, tvec in ext_poses:
        fl.append(_render_frame(K_TRUE, rvec, tvec))
        Rr = R_TRUE @ cv2.Rodrigues(rvec)[0]
        tr = R_TRUE @ tvec + T_TRUE
        fr.append(_render_frame(K_TRUE, cv2.Rodrigues(Rr)[0].ravel(), tr))
    write_video(vids / "left_extrinsic.mp4", np.stack(fl), fps=5)
    write_video(vids / "right_extrinsic.mp4", np.stack(fr), fps=5)
    return root


def test_full_calibration_workflow(test_dir, capsys):
    board = f"{COLS}x{ROWS}"
    rc = main([
        "intrinsic", "--test-dir", str(test_dir), "--board", board,
        "--square", str(SQ),
        "--frame-interval", "1", "--start-frame", "0", "--max-frames", "14",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    for rep in lines:
        assert rep["rms_px"] < 1.0  # reference fail gate

    store = ArtifactStore(test_dir)
    K1, _ = store.load_intrinsics("left")
    assert abs(K1[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.03  # focal within 3%

    rc = main([
        "extrinsic", "--test-dir", str(test_dir), "--board", board,
        "--square", str(SQ), "--actual-distance", str(np.linalg.norm(T_TRUE)),
        "--frame-interval", "1", "--start-frame", "0", "--max-frames", "10",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["baseline_error_pct"] < 3.0

    rc = main(["rectify", "--test-dir", str(test_dir), "--size", f"{SIZE[0]}x{SIZE[1]}"])
    assert rc == 0
    R1, R2, P1, P2, Q = store.load_rectification()
    assert Q.shape == (4, 4)

    # Distance validation with the ESTIMATED calibration (not ground
    # truth): the reference's headline accuracy claim (~6% distance error,
    # BASELINE.md) — the rendered rig should do far better.
    rvec_v = np.array([0.03, -0.05, 0.01])
    tvec_v = np.array([-170.0, -70.0, 1500.0])
    cv2.imwrite(str(test_dir / "val_left.png"), _render_frame(K_TRUE, rvec_v, tvec_v))
    Rv = cv2.Rodrigues(rvec_v)[0]
    # right view: board pose in cam2 coordinates (X2 = R X1 + T).
    R2_pose = R_TRUE @ Rv
    t2_pose = R_TRUE @ tvec_v + T_TRUE
    cv2.imwrite(
        str(test_dir / "val_right.png"),
        _render_frame(K_TRUE, cv2.Rodrigues(R2_pose)[0].ravel(), t2_pose),
    )
    obj = np.array([[j * SQ, i * SQ, 0.0] for i in range(ROWS) for j in range(COLS)])
    gt_dist = float(np.linalg.norm((obj @ Rv.T + tvec_v).mean(axis=0)))
    rc = main([
        "validate-distance", "--test-dir", str(test_dir),
        "--left", str(test_dir / "val_left.png"),
        "--right", str(test_dir / "val_right.png"),
        "--actual-distance", f"{gt_dist:.1f}", "--board", board,
    ])
    assert rc == 0  # within the 10% pass tolerance
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["error_percent"] < 5.0, rep  # beats the reference's ~6%
