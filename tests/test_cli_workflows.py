"""CLI parity with the reference's script entry points (SCRIPT_RUNNER.sh):
pose / ball-drop / smooth / animate / analyze subcommands, driven end to
end from rendered videos and saved artifacts (reference 3dpose.py,
ball_drop.py, motion_smoothing.py, visualize_smoothing.py,
archive/analyze_validation.py mains).
"""

import json
import pickle

import numpy as np
import pytest

from stereo_vision_tpu.models.pretrained import BALL_WEIGHTS, POSE_WEIGHTS
from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
from stereo_vision_tpu.pipeline.cli import main
from stereo_vision_tpu.track.fusion import StereoRig


def _rig(f=350.0, W=320, H=240, baseline=500.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    return StereoRig(
        K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
        R=np.eye(3), T=np.array([-baseline, 0, 0]),
    )


def _save_rig(test_dir, rig):
    store = ArtifactStore(test_dir)
    store.save_intrinsics("left", rig.K1, rig.d1)
    store.save_intrinsics("right", rig.K2, rig.d2)
    store.save_extrinsics(rig.R, rig.T)
    return store


def _pose_sequence(T=60, J=13, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, T)[:, None, None]
    base = rng.normal(0, 300, (1, J, 3))
    smooth = base + 100 * np.sin(t + rng.uniform(0, np.pi, (1, J, 1)))
    return smooth + rng.normal(0, 8, (T, J, 3))


def _out_json(capsys):
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_smooth_command(tmp_path, capsys):
    poses = _pose_sequence()
    src = tmp_path / "pose_3d_original.pkl"
    with open(src, "wb") as f:
        pickle.dump(poses, f)
    rc = main(["smooth", "--input", str(src), "--preset", "smalliphone"])
    assert rc == 0
    out = _out_json(capsys)
    # Smoothing must reduce jitter (the reference's regression metric).
    assert out["jitter_after"] < out["jitter_before"]
    with open(out["output"], "rb") as f:
        sm = pickle.load(f)
    assert sm.shape == poses.shape


def test_smooth_accepts_reference_pickle_schema(tmp_path, capsys):
    """The reference's 3dpose pickles are dicts with 'poses' etc.
    (3dpose.py:935-965); the CLI must consume them unchanged."""
    poses = _pose_sequence(seed=9)
    src = tmp_path / "pose_3d_data.pkl"
    with open(src, "wb") as f:
        pickle.dump(
            {"poses": poses, "angles": [], "timestamps": list(range(len(poses))),
             "fps": 30.0},
            f,
        )
    rc = main(["smooth", "--input", str(src)])
    assert rc == 0
    out = _out_json(capsys)
    assert out["jitter_after"] < out["jitter_before"]


def test_animate_command(tmp_path, capsys):
    poses = _pose_sequence(T=12)
    raw_p, sm_p = tmp_path / "raw.pkl", tmp_path / "sm.pkl"
    with open(raw_p, "wb") as f:
        pickle.dump(poses, f)
    with open(sm_p, "wb") as f:
        pickle.dump(poses * 0.9, f)
    out = tmp_path / "compare.mp4"
    rc = main([
        "animate", "--raw", str(raw_p), "--smoothed", str(sm_p),
        "--out", str(out), "--fps", "2", "--duration", "1.5",
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0


def test_analyze_command(tmp_path, capsys):
    res = tmp_path / "results"
    res.mkdir()
    for d_mm, meas in ((2000.0, 2050.0), (3000.0, 2910.0), (4000.0, 4160.0)):
        rec = [{
            "measured_distance_mm": meas,
            "actual_distance_mm": d_mm,
            "error_percent": abs(meas - d_mm) / d_mm * 100,
        }]
        (res / f"run_{int(d_mm)}_validation.json").write_text(json.dumps(rec))
    rc = main(["analyze", "--results-dir", str(res)])
    assert rc == 0
    out = _out_json(capsys)
    assert out["runs"] == 3
    assert (res / "validation_report.md").exists() or out["report"]


@pytest.mark.skipif(not POSE_WEIGHTS.exists(), reason="pose weights not trained")
def test_pose_command_end_to_end(tmp_path, capsys):
    """Rendered stereo videos + saved calibration -> pose subcommand."""
    from stereo_vision_tpu.io.video import write_video
    from stereo_vision_tpu.synth import render_pose_stereo

    rig = _rig()
    _save_rig(tmp_path, rig)
    lf, rf, _ = render_pose_stereo(rig, T=16, H=240, W=320, seed=4)
    lv, rv = tmp_path / "left.mp4", tmp_path / "right.mp4"
    write_video(lv, lf, fps=30)
    write_video(rv, rf, fps=30)
    rc = main(["pose", "--test-dir", str(tmp_path), "--left", str(lv), "--right", str(rv)])
    assert rc == 0
    out = _out_json(capsys)
    assert out["frames"] == 16
    assert out["valid_pose_fraction"] > 0.8
    pose_dir = tmp_path / "results" / "pose"
    for artifact in ("pose_3d_original.pkl", "pose_3d_smoothed.pkl",
                     "joint_angles.csv", "smoothing_stats.json",
                     "angle_statistics.txt", "angle_statistics.csv"):
        assert (pose_dir / artifact).exists(), artifact
    stats_csv = (pose_dir / "angle_statistics.csv").read_text().splitlines()
    assert stats_csv[0] == "joint,mean,median,std,min,max"
    assert len(stats_csv) > 1


@pytest.mark.skipif(not BALL_WEIGHTS.exists(), reason="ball weights not trained")
def test_ball_drop_command_end_to_end(tmp_path, capsys):
    """Rendered drop videos + saved calibration -> ball-drop subcommand."""
    from stereo_vision_tpu.io.video import write_video
    from stereo_vision_tpu.synth import render_ball_drop_stereo

    rig = _rig()
    _save_rig(tmp_path, rig)
    fps = 240.0
    lf, rf, _, _, _ = render_ball_drop_stereo(
        rig, T=120, fps=fps, H=240, W=320, hold_frames=25,
        ball_radius_mm=80.0, seed=3,
    )
    lv, rv = tmp_path / "left.mp4", tmp_path / "right.mp4"
    write_video(lv, lf, fps=fps)
    write_video(rv, rf, fps=fps)
    rc = main([
        "ball-drop", "--test-dir", str(tmp_path),
        "--left", str(lv), "--right", str(rv), "--fps", str(fps), "--animate",
    ])
    assert rc == 0
    out = _out_json(capsys)
    g = out["gravity_mm_s2"]
    assert g is not None and abs(g - 9800.0) / 9800.0 < 0.1, g
    bd = tmp_path / "results" / "ball_drop"
    assert (bd / "drop_report.json").exists()
    assert (bd / "ball_motion.mp4").stat().st_size > 0


def test_skip_existing_resume(tmp_path, capsys):
    """--skip-existing resumes past completed stages without videos
    (v4 runner.py:118,182-190 semantics)."""
    rig = _rig()
    _save_rig(tmp_path, rig)
    rc = main(["intrinsic", "--test-dir", str(tmp_path), "--skip-existing"])
    assert rc == 0
    assert _out_json(capsys)["status"] == "skipped"
    rc = main(["extrinsic", "--test-dir", str(tmp_path), "--skip-existing"])
    assert rc == 0
    assert _out_json(capsys)["status"] == "skipped"
    # Without the flag the same invocation must NOT silently skip: it
    # attempts the real stage and fails on the missing videos.
    assert main(["intrinsic", "--test-dir", str(tmp_path)]) == 2


def test_validate_distance_then_analyze(tmp_path, capsys):
    """Rendered checkerboard pair at a known distance -> validate-distance
    -> analyze (reference checkerboard_distance.py + analyze_validation.py
    as one CLI chain)."""
    import cv2

    from test_cli_full_stack import COLS, ROWS, SQ, _render_frame
    from stereo_vision_tpu.pipeline.stages import run_rectification_stage

    K = np.array([[520.0, 0, 320.0], [0, 520.0, 200.0], [0, 0, 1.0]])
    baseline = 400.0
    rig = StereoRig(
        K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
        R=np.eye(3), T=np.array([-baseline, 0, 0]),
    )
    _save_rig(tmp_path, rig)
    run_rectification_stage(ArtifactStore(tmp_path), (640, 400))

    rvec = np.array([0.05, -0.04, 0.02])
    tvec = np.array([-150.0, -80.0, 1900.0])
    cv2.imwrite(str(tmp_path / "left.png"), _render_frame(K, rvec, tvec))
    cv2.imwrite(str(tmp_path / "right.png"),
                _render_frame(K, rvec, tvec + rig.T))

    obj = np.array([[j * SQ, i * SQ, 0.0] for i in range(ROWS) for j in range(COLS)])
    Rb = cv2.Rodrigues(rvec)[0]
    gt = float(np.linalg.norm((obj @ Rb.T + tvec).mean(axis=0)))

    rc = main([
        "validate-distance", "--test-dir", str(tmp_path),
        "--left", str(tmp_path / "left.png"),
        "--right", str(tmp_path / "right.png"),
        "--actual-distance", f"{gt:.1f}", "--board", f"{COLS}x{ROWS}",
    ])
    assert rc == 0  # within the 10% tolerance -> passed
    out = _out_json(capsys)
    assert abs(out["measured"] - gt) / gt < 0.02, (out["measured"], gt)
    jsons = list((tmp_path / "results").glob("*_validation.json"))
    assert len(jsons) == 1

    rc = main(["analyze", "--results-dir", str(tmp_path / "results")])
    assert rc == 0
    rep = _out_json(capsys)
    assert rep["runs"] == 1 and rep["mean_error_percent"] < 5.0
