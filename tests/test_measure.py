"""Click-to-measure replay (pipeline/measure.py) — the headless rebuild
of the reference's interactive DistanceMeasurementTool
(calibrate_v4/distance.py:227-486): clicked correspondences in both
views triangulate to 3D and recover known distances."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.ops.distortion import project_points
from stereo_vision_tpu.ops.rotation import rodrigues_inv
from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
from stereo_vision_tpu.pipeline.cli import main
from stereo_vision_tpu.pipeline.measure import (
    ClickMeasurement,
    load_clicks,
    measure_clicks,
    save_clicks,
)
from stereo_vision_tpu.track.fusion import StereoRig


def _rig(f=350.0, W=320, H=240, baseline=500.0, dist=None):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    d = np.zeros(8) if dist is None else np.asarray(dist, float)
    return StereoRig(K1=K, d1=d, K2=K, d2=d, R=np.eye(3), T=np.array([-baseline, 0, 0]))


def _clicks_for(rig, pts3d, name="obj", expected=None):
    """Project known 3D points (camera-1 frame) into both views."""
    rv = np.asarray(rodrigues_inv(jnp.asarray(rig.R)))
    left = np.asarray(
        project_points(jnp.asarray(pts3d), jnp.zeros(3), jnp.zeros(3),
                       jnp.asarray(rig.K1), jnp.asarray(rig.d1))
    )
    right = np.asarray(
        project_points(jnp.asarray(pts3d), jnp.asarray(rv), jnp.asarray(rig.T),
                       jnp.asarray(rig.K2), jnp.asarray(rig.d2))
    )
    return ClickMeasurement(name=name, left=left, right=right, expected_mm=expected)


class TestMeasureClicks:
    def test_point_pair_distance_recovered(self):
        rig = _rig(dist=[0.08, -0.05, 0.001, 0.0005, 0.0, 0, 0, 0])
        a = np.array([-120.0, 40.0, 2000.0])
        b = np.array([180.0, -60.0, 2300.0])
        m = _clicks_for(rig, np.stack([a, b]), expected=float(np.linalg.norm(a - b)))
        P1 = rig.K1 @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = rig.K2 @ np.hstack([rig.R, rig.T.reshape(3, 1)])
        (rep,) = measure_clicks([m], rig.K1, rig.d1, rig.K2, rig.d2, P1, P2)
        assert rep.distance_mm == pytest.approx(np.linalg.norm(a - b), rel=1e-3)
        np.testing.assert_allclose(rep.points_3d[0], a, atol=1.0)
        assert rep.validation is not None and rep.validation.passed

    def test_rotated_rig_distance_recovered(self):
        """Regression: with a verged rig (R != I) the unrectified path
        must undistort with each camera's own K, NOT with P2 = K2@[R|T]
        (which would read fx'/cx' out of K2@R and corrupt the right
        clicks)."""
        ang = np.deg2rad(6.0)  # ~6 deg vergence about y
        R = np.array([
            [np.cos(ang), 0.0, np.sin(ang)],
            [0.0, 1.0, 0.0],
            [-np.sin(ang), 0.0, np.cos(ang)],
        ])
        base = _rig(dist=[0.06, -0.03, 0.0008, 0.0004, 0.0, 0, 0, 0])
        rig = StereoRig(K1=base.K1, d1=base.d1, K2=base.K2, d2=base.d2,
                        R=R, T=base.T)
        a = np.array([-90.0, 30.0, 1900.0])
        b = np.array([150.0, -40.0, 2200.0])
        m = _clicks_for(rig, np.stack([a, b]), expected=float(np.linalg.norm(a - b)))
        P1 = rig.K1 @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = rig.K2 @ np.hstack([rig.R, rig.T.reshape(3, 1)])
        (rep,) = measure_clicks([m], rig.K1, rig.d1, rig.K2, rig.d2, P1, P2)
        assert rep.distance_mm == pytest.approx(np.linalg.norm(a - b), rel=1e-3)
        np.testing.assert_allclose(rep.points_3d[0], a, atol=1.0)
        assert rep.validation is not None and rep.validation.passed

    def test_single_point_camera_distance(self):
        rig = _rig()
        p = np.array([50.0, -30.0, 1800.0])
        m = _clicks_for(rig, p[None], expected=float(np.linalg.norm(p)))
        P1 = rig.K1 @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = rig.K2 @ np.hstack([rig.R, rig.T.reshape(3, 1)])
        (rep,) = measure_clicks([m], rig.K1, rig.d1, rig.K2, rig.d2, P1, P2)
        assert rep.distance_mm is None
        assert rep.camera_distance_mm[0] == pytest.approx(np.linalg.norm(p), rel=1e-3)
        assert rep.validation.passed

    def test_clicks_file_roundtrip(self, tmp_path):
        m = ClickMeasurement(
            "ruler", np.array([[1.0, 2.0], [3.0, 4.0]]),
            np.array([[0.5, 2.0], [2.5, 4.0]]), expected_mm=304.8,
        )
        path = tmp_path / "clicks.json"
        save_clicks(path, [m])
        (loaded,) = load_clicks(path)
        assert loaded.name == "ruler" and loaded.expected_mm == 304.8
        np.testing.assert_array_equal(loaded.left, m.left)

    def test_mismatched_clicks_rejected(self, tmp_path):
        path = tmp_path / "bad.json"
        path.write_text(json.dumps({"measurements": [
            {"name": "x", "left": [[0, 0]], "right": [[0, 0], [1, 1]]}
        ]}))
        with pytest.raises(ValueError):
            load_clicks(path)


class TestMeasureCLI:
    def test_end_to_end(self, tmp_path, capsys):
        rig = _rig()
        store = ArtifactStore(tmp_path)
        store.save_intrinsics("left", rig.K1, rig.d1)
        store.save_intrinsics("right", rig.K2, rig.d2)
        store.save_extrinsics(rig.R, rig.T)
        a = np.array([-100.0, 20.0, 2100.0])
        b = np.array([120.0, 10.0, 2100.0])
        m = _clicks_for(rig, np.stack([a, b]), name="doorway",
                        expected=float(np.linalg.norm(a - b)))
        clicks_path = tmp_path / "clicks.json"
        save_clicks(clicks_path, [m])
        out_path = tmp_path / "measure.json"
        rc = main([
            "measure", "--test-dir", str(tmp_path),
            "--clicks", str(clicks_path), "--out", str(out_path),
        ])
        assert rc == 0
        data = json.loads(out_path.read_text())
        got = data["measurements"][0]
        assert got["validation"]["passed"]
        assert got["distance_mm"] == pytest.approx(np.linalg.norm(a - b), rel=1e-3)
