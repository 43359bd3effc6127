"""Reporting smoke tests: every artifact writes a non-empty file."""

import numpy as np

from stereo_vision_tpu.pipeline.reporting import (
    save_rectification_preview,
    save_distortion_map,
    save_camera_pose_plot,
    save_angle_series,
    save_trajectory_3d,
    save_occlusion_heatmap,
    smoothing_comparison_stats,
    save_calibration_report,
)
from stereo_vision_tpu.track.validators import ValidationResult


def test_all_reports_write(tmp_path, rng):
    img = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    p = save_rectification_preview(img, img, tmp_path / "rect.png")
    assert p.stat().st_size > 0

    ys, xs = np.mgrid[0:120, 0:160].astype(np.float32)
    p = save_distortion_map(xs + 3, ys - 2, tmp_path / "dist.png")
    assert p.stat().st_size > 0

    p = save_camera_pose_plot(np.eye(3), np.array([-500.0, 0, 0]), tmp_path / "rig.png")
    assert p.stat().st_size > 0

    angles = rng.uniform(0, 180, (50, 8))
    p = save_angle_series(angles, 30.0, tmp_path / "angles.png", smoothed=angles)
    assert p.stat().st_size > 0

    seq = rng.normal(0, 100, (40, 13, 3))
    p = save_trajectory_3d(seq, tmp_path / "traj.png")
    assert p.stat().st_size > 0

    p = save_occlusion_heatmap(rng.integers(0, 50, (8, 4)), tmp_path / "occ.png")
    assert p.stat().st_size > 0


def test_smoothing_stats_reduction(rng):
    clean = np.cumsum(rng.normal(0, 1, (60, 13, 3)), axis=0)
    noisy = clean + rng.normal(0, 5, clean.shape)
    stats = smoothing_comparison_stats(noisy, clean)
    assert stats["jitter_after"] < stats["jitter_before"]
    assert stats["jitter_reduction_pct"] > 0


def test_pdf_report(tmp_path):
    p = save_calibration_report(
        tmp_path / "report.pdf",
        intrinsics={
            "left": {"K": np.eye(3) * 1000, "dist": np.zeros(8), "rms": 0.31},
            "right": {"K": np.eye(3) * 1000, "dist": np.zeros(8), "rms": 0.29},
        },
        stereo={
            "baseline": 502.3,
            "rms": 0.41,
            "R": np.eye(3),
            "T": np.array([-502.0, 10.0, 5.0]),
        },
        validation=[ValidationResult.make("distance", 2157.0, 2295.0, 10.0)],
    )
    assert p.stat().st_size > 1000


def test_video_overlays(tmp_path, rng):
    from stereo_vision_tpu.pipeline.video_viz import render_skeleton_video, render_ball_video
    from stereo_vision_tpu.io.video import video_info

    T, H, W = 6, 64, 96
    frames = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)
    joints = rng.uniform(5, 60, (T, 13, 2))
    p = render_skeleton_video(frames, joints, tmp_path / "skel.mp4", fps=10, smoothed_px=joints)
    assert video_info(p)["frame_count"] == T

    centers = rng.uniform(10, 80, (T, 2))
    centers[2] = np.nan  # missed detection
    p2 = render_ball_video(frames, centers, np.full(T, 5.0), tmp_path / "ball.mp4", fps=10)
    assert video_info(p2)["frame_count"] == T


def test_pose_comparison_video(tmp_path, rng):
    from stereo_vision_tpu.pipeline.animations import create_pose_comparison_video
    from stereo_vision_tpu.io.video import video_info

    T = 12
    raw = rng.normal(0, 200, (T, 13, 3)).cumsum(axis=0) / 3 + [0, 0, 2000]
    sm = raw + rng.normal(0, 2, raw.shape)
    raw[3, 5] = np.nan  # gap joint
    p = create_pose_comparison_video(raw, sm, tmp_path / "cmp.mp4", fps=5, duration=1.0)
    assert video_info(p)["frame_count"] == 5


def test_rolling_animation(tmp_path, rng):
    from stereo_vision_tpu.pipeline.animations import create_rolling_animation
    from stereo_vision_tpu.io.video import video_info

    T = 8
    t = np.arange(T) / 20.0
    lx = np.stack([100 + 30 * t * 20, 200 + 5 * t * 20], 1)
    rx = lx - [40.0, 0.0]
    lx[4] = np.nan  # missed frame
    p = create_rolling_animation(lx, rx, t, tmp_path / "roll.mp4", fps=10)
    assert video_info(p)["frame_count"] == T


def test_sync_visualization_and_report(tmp_path, rng):
    from stereo_vision_tpu.pipeline.animations import (
        save_sync_visualizations,
        write_sync_report,
    )

    T, H, W = 4, 48, 64
    lf = rng.integers(0, 255, (T, H, W, 3)).astype(np.uint8)
    rf = rng.integers(0, 255, (T, H // 2, W // 2, 3)).astype(np.uint8)  # mixed size
    pairs = [(i, i + 2) for i in range(T)]
    paths = save_sync_visualizations(lf, rf, pairs, tmp_path / "sync", sample_count=3)
    assert len(paths) == 3 and all(p.stat().st_size > 500 for p in paths)

    rep = write_sync_report(
        {
            "frame_offset": 2,
            "left_flash_frame": 31,
            "right_flash_frame": 33,
            "left_fps": 30.0,
            "right_fps": 30.0,
            "left_frame_count": 900,
            "right_frame_count": 910,
            "left_video": "left.mp4",
            "right_video": "right.mp4",
        },
        tmp_path / "sync_report.txt",
    )
    text = rep.read_text()
    assert "right_frame = X + 2" in text and "left_frame = Y - 2" in text
