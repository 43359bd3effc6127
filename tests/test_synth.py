"""Synthetic scene renderers: geometry of the ground truth."""

import numpy as np

from stereo_vision_tpu.synth import (
    ball_training_batch,
    body33_from_key13,
    pose_training_batch,
    render_ball_drop_stereo,
    render_pose_stereo,
)
from stereo_vision_tpu.track.joints import JOINT_INDEX, KEY_JOINTS


def _rig():
    from stereo_vision_tpu.track.fusion import StereoRig

    K = np.array([[350.0, 0, 160], [0, 350.0, 120], [0, 0, 1.0]])
    return StereoRig(K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
                     R=np.eye(3), T=np.array([-500.0, 0, 0]))


def test_ball_batch_boxes_cover_ball():
    rng = np.random.default_rng(0)
    imgs, boxes, classes, valid = ball_training_batch(rng, 4, 96, 96)
    assert imgs.shape == (4, 96, 96, 3) and imgs.max() <= 1.0
    for i in range(4):
        x1, y1, x2, y2 = boxes[i, 0]
        cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
        inside = imgs[i, cy, cx]
        # drawn ball differs from corner background
        assert np.abs(inside - imgs[i, 2, 2]).max() > 0.1


def test_ball_drop_projection_consistent():
    rig = _rig()
    lf, rf, uv_l, uv_r, traj = render_ball_drop_stereo(rig, T=30, H=120, W=160, seed=1)
    assert lf.shape == (30, 120, 160, 3)
    # disparity = f*B/Z
    disp = uv_l[:, 0] - uv_r[:, 0]
    expect = 350.0 * 500.0 / traj[:, 2]
    np.testing.assert_allclose(disp, expect, rtol=1e-6)
    # free fall after hold
    dy = np.diff(traj[:, 1])
    assert dy[0] == 0 and dy[-1] > 0


def test_body33_key_mapping():
    from stereo_vision_tpu.synth.scenes import _BASE13

    b33 = body33_from_key13(_BASE13)
    for name, mp in KEY_JOINTS.items():
        np.testing.assert_array_equal(b33[mp], _BASE13[JOINT_INDEX[name]])
    assert np.abs(b33).sum() > 0


def test_pose_batch_gt_in_range():
    rng = np.random.default_rng(2)
    imgs, gt = pose_training_batch(rng, 3, 96, 96)
    assert gt.shape == (3, 33, 4)
    vis = gt[..., 3] > 0.5
    assert vis.mean() > 0.5
    assert (gt[..., :2][vis] >= 0).all() and (gt[..., :2][vis] <= 1).all()


def test_render_pose_stereo_shapes():
    rig = _rig()
    lf, rf, gt = render_pose_stereo(rig, T=5, H=120, W=160, seed=0)
    assert lf.shape == (5, 120, 160, 3) and gt.shape == (5, 33, 3)
    # frames actually contain the figure (differ from pure background drift)
    assert np.abs(lf[0].astype(int) - lf[-1].astype(int)).max() > 30
