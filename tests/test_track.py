"""Temporal analytics tests: smoothing (scipy parity), constraints,
kinematics (synthetic gravity recovery), angles, fusion."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import savgol_filter as scipy_savgol

from stereo_vision_tpu.track import (
    MotionSmoother,
    savgol_filter_time,
    moving_average_time,
    apply_anatomical_constraints_sequence,
    apply_velocity_constraints,
    average_limb_lengths,
    estimate_gravity,
    detect_start_of_motion,
    pose_angles_dict,
    angle_3d,
    JOINT_INDEX,
    NUM_JOINTS,
    LIMB_PAIRS,
    StereoRig,
    StereoPoseTracker,
    validate_baseline,
    validate_gravity,
)


class TestSavgol:
    @pytest.mark.parametrize("window,poly", [(9, 2), (13, 3), (31, 3)])
    def test_matches_scipy(self, window, poly, rng):
        x = rng.normal(size=(100, 4)).astype(np.float64)
        ours = np.asarray(savgol_filter_time(jnp.asarray(x), window, poly))
        ref = scipy_savgol(x, window, poly, axis=0, mode="interp")
        np.testing.assert_allclose(ours, ref, atol=1e-8)

    def test_multi_axis(self, rng):
        x = rng.normal(size=(50, 13, 3))
        ours = np.asarray(savgol_filter_time(jnp.asarray(x), 9, 2))
        ref = scipy_savgol(x, 9, 2, axis=0, mode="interp")
        np.testing.assert_allclose(ours, ref, atol=1e-8)

    def test_moving_average_edges_keep_original(self, rng):
        x = rng.normal(size=(20, 2))
        out = np.asarray(moving_average_time(jnp.asarray(x), 5))
        np.testing.assert_allclose(out[:2], x[:2])
        np.testing.assert_allclose(out[-2:], x[-2:])
        # interior is an average
        np.testing.assert_allclose(out[10], x[8:13].mean(0), atol=1e-5)


def _synthetic_pose_sequence(T=60, noise=3.0, seed=42):
    """Rigid skeleton translating smoothly + noise (NaN-free)."""
    rng = np.random.default_rng(seed)
    base = np.zeros((NUM_JOINTS, 3))
    base[JOINT_INDEX["nose"]] = [0, 1600, 3000]
    base[JOINT_INDEX["left_shoulder"]] = [-175, 1400, 3000]
    base[JOINT_INDEX["right_shoulder"]] = [175, 1400, 3000]
    base[JOINT_INDEX["left_elbow"]] = [-320, 1150, 3000]
    base[JOINT_INDEX["right_elbow"]] = [320, 1150, 3000]
    base[JOINT_INDEX["left_wrist"]] = [-380, 920, 3000]
    base[JOINT_INDEX["right_wrist"]] = [380, 920, 3000]
    base[JOINT_INDEX["left_hip"]] = [-125, 950, 3000]
    base[JOINT_INDEX["right_hip"]] = [125, 950, 3000]
    base[JOINT_INDEX["left_knee"]] = [-140, 550, 3000]
    base[JOINT_INDEX["right_knee"]] = [140, 550, 3000]
    base[JOINT_INDEX["left_ankle"]] = [-150, 170, 3000]
    base[JOINT_INDEX["right_ankle"]] = [150, 170, 3000]
    t = np.linspace(0, 1, T)[:, None, None]
    drift = np.array([200.0, 0, 0]) * t
    seq = base[None] + drift + rng.normal(0, noise, (T, NUM_JOINTS, 3))
    return seq


class TestMotionSmoother:
    def test_reduces_jitter(self):
        seq = _synthetic_pose_sequence(noise=5.0)
        sm = MotionSmoother("smalliphone")
        out = sm.smooth_pose_sequence(seq)
        # jitter = mean second-derivative magnitude (test_smoothing.py:176-301)
        jit_in = np.abs(np.diff(seq, n=2, axis=0)).mean()
        jit_out = np.abs(np.diff(out, n=2, axis=0)).mean()
        assert jit_out < 0.5 * jit_in
        assert sm.stats["frames_processed"] == seq.shape[0]

    def test_short_sequence_passthrough(self):
        seq = _synthetic_pose_sequence(T=5)
        out = MotionSmoother("smalliphone").smooth_pose_sequence(seq)
        np.testing.assert_allclose(out, seq)

    def test_nan_gaps_preserved(self):
        seq = _synthetic_pose_sequence(T=40, noise=1.0)
        seq[10:15, JOINT_INDEX["left_wrist"]] = np.nan
        out = MotionSmoother("smalliphone").smooth_pose_sequence(seq)
        assert np.isnan(out[12, JOINT_INDEX["left_wrist"]]).all()
        assert np.isfinite(out[0]).all()

    def test_synthetic_pendulum_rmse(self):
        # The reference's own self-test idea (motion_smoothing.py:764-806):
        # noisy pendulum, smoothing must reduce RMSE vs ground truth.
        rng = np.random.default_rng(42)
        T = 100
        t = np.linspace(0, 2 * np.pi, T)
        clean = _synthetic_pose_sequence(T, noise=0.0)
        clean[:, JOINT_INDEX["right_wrist"], 0] += 100 * np.sin(t)
        noisy = clean + rng.normal(0, 4.0, clean.shape)
        out = MotionSmoother("smalliphone").smooth_pose_sequence(noisy)
        rmse_in = np.sqrt(((noisy - clean) ** 2).mean())
        rmse_out = np.sqrt(((out - clean) ** 2).mean())
        assert rmse_out < rmse_in


class TestConstraints:
    def test_limb_length_restored(self):
        seq = _synthetic_pose_sequence(T=20, noise=0.0)
        ref = average_limb_lengths(seq)
        # stretch one elbow->wrist limb by 30% in one frame
        i = JOINT_INDEX["left_wrist"]
        j = JOINT_INDEX["left_elbow"]
        seq2 = seq.copy()
        seq2[5, i] = seq2[5, j] + (seq2[5, i] - seq2[5, j]) * 1.3
        out, n = apply_anatomical_constraints_sequence(seq2, ref, tolerance=0.05)
        assert n >= 1
        fixed_len = np.linalg.norm(out[5, i] - out[5, j])
        pair_idx = LIMB_PAIRS.index(("left_elbow", "left_wrist"))
        assert abs(fixed_len - ref[pair_idx]) < 1e-6

    def test_velocity_outlier_replaced(self):
        seq = _synthetic_pose_sequence(T=20, noise=0.0)
        j = JOINT_INDEX["nose"]
        seq[10, j] += 500.0  # teleport
        out, n = apply_velocity_constraints(seq, velocity_threshold=50.0)
        assert n >= 1
        # frame 10 pulled back toward the prev/next midpoint
        assert np.linalg.norm(out[10, j] - seq[10, j]) > 100.0

    def test_gate_excludes_bogus_lengths(self):
        seq = _synthetic_pose_sequence(T=10, noise=0.0)
        seq[:, JOINT_INDEX["left_wrist"]] = seq[:, JOINT_INDEX["left_elbow"]] + 1e-3
        lengths = average_limb_lengths(seq)
        pair_idx = LIMB_PAIRS.index(("left_elbow", "left_wrist"))
        assert np.isnan(lengths[pair_idx])  # < 10mm -> gated out


class TestKinematics:
    def test_gravity_recovery(self):
        # Ballistic drop: y(t) = y0 - 0.5 g t^2 with y up == -axis1.
        fps = 240.0
        t = np.arange(120) / fps
        g = 9800.0
        pos = np.zeros((120, 3))
        pos[:, 1] = 0.5 * g * t**2  # y grows downward
        g_est, err = estimate_gravity(pos, t)
        assert err < 1e-6 or abs(g_est - (-g)) < 1e-3 or abs(g_est - g) < 1e-3

    def test_gravity_validator(self):
        fps = 240.0
        t = np.arange(120) / fps
        pos = np.zeros((120, 3))
        pos[:, 1] = 0.5 * 9800.0 * t**2
        r = validate_gravity(pos, t)
        # sign convention: -a_y with y downward gives -9800; the validator
        # measures |mean| against 9800 only through error percent
        assert r.expected == 9800.0

    def test_motion_start(self):
        pos = np.zeros((60, 3))
        pos[30:, 1] = np.cumsum(np.full(30, 10.0))  # motion starts at 30
        idx = detect_start_of_motion(pos, num_frames=5, threshold=5.0)
        assert 28 <= idx <= 31


class TestAngles:
    def test_right_angle(self):
        a = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 0.0, 0.0])
        c = jnp.array([0.0, 1.0, 0.0])
        assert abs(float(angle_3d(a, b, c)) - 90.0) < 1e-5

    def test_tpose_shoulder(self):
        pose = _synthetic_pose_sequence(T=1, noise=0.0)[0]
        # T-pose: arms horizontal
        pose[JOINT_INDEX["left_elbow"]] = pose[JOINT_INDEX["left_shoulder"]] + [-300, 0, 0]
        pose[JOINT_INDEX["left_wrist"]] = pose[JOINT_INDEX["left_shoulder"]] + [-550, 0, 0]
        # hip directly below shoulder
        pose[JOINT_INDEX["left_hip"]] = pose[JOINT_INDEX["left_shoulder"]] + [0, -450, 0]
        angles = pose_angles_dict(pose)
        assert abs(angles["left_shoulder"] - 90.0) < 1.0  # documented T-pose check


class TestFusion:
    def _rig(self):
        K = np.array([[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]])
        R = np.eye(3)
        T = np.array([-500.0, 0, 0])  # 500mm baseline
        return StereoRig(K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8), R=R, T=T)

    def _project(self, rig, pts):
        P1, P2 = rig.P1, rig.P2
        ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        l = (P1 @ ph.T).T
        r = (P2 @ ph.T).T
        return l[:, :2] / l[:, 2:], r[:, :2] / r[:, 2:]

    def test_both_views_triangulate(self):
        rig = self._rig()
        gt = _synthetic_pose_sequence(T=1, noise=0.0)[0]
        lxy, rxy = self._project(rig, gt)
        lm_l = np.zeros((33, 4))
        lm_r = np.zeros((33, 4))
        from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES

        lm_l[MEDIAPIPE_INDICES, :2] = lxy
        lm_l[MEDIAPIPE_INDICES, 3] = 0.99
        lm_r[MEDIAPIPE_INDICES, :2] = rxy
        lm_r[MEDIAPIPE_INDICES, 3] = 0.99
        tracker = StereoPoseTracker(rig)
        pose = tracker.process_frame(lm_l, lm_r)
        np.testing.assert_allclose(pose, gt, atol=1e-3)

    def test_single_camera_recovery_uses_history(self):
        rig = self._rig()
        gt = _synthetic_pose_sequence(T=1, noise=0.0)[0]
        lxy, rxy = self._project(rig, gt)
        from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES

        def lm(xy, conf):
            m = np.zeros((33, 4))
            m[MEDIAPIPE_INDICES, :2] = xy
            m[MEDIAPIPE_INDICES, 3] = conf
            return m

        tracker = StereoPoseTracker(rig)
        tracker.process_frame(lm(lxy, 0.99), lm(rxy, 0.99))  # builds history
        # now drop right-camera wrist visibility
        conf_r = np.full(13, 0.99)
        conf_r[JOINT_INDEX["left_wrist"]] = 0.1
        m_r = lm(rxy, 0.99)
        m_r[MEDIAPIPE_INDICES[JOINT_INDEX["left_wrist"]], 3] = 0.1
        pose = tracker.process_frame(lm(lxy, 0.99), m_r)
        # wrist recovered via historical depth, close to ground truth
        assert np.isfinite(pose[JOINT_INDEX["left_wrist"]]).all()
        np.testing.assert_allclose(
            pose[JOINT_INDEX["left_wrist"]], gt[JOINT_INDEX["left_wrist"]], atol=5.0
        )


class TestFusedSequence:
    def test_scan_matches_frame_loop_500_frames(self):
        """fuse_pose_sequence (one lax.scan program) must reproduce the
        streaming StereoPoseTracker loop exactly, recovery paths included."""
        from stereo_vision_tpu.track.fusion import fuse_pose_sequence
        from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES

        K = np.array([[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]])
        rig = StereoRig(
            K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
            R=np.eye(3), T=np.array([-500.0, 0, 0]),
        )
        T = 500
        rng = np.random.default_rng(3)
        lm_l = np.zeros((T, 33, 4))
        lm_r = np.zeros((T, 33, 4))
        # Smooth wandering 2D tracks + visibility dropouts that exercise
        # the historical-depth and anatomy recovery branches.
        base = np.cumsum(rng.normal(0, 2.0, (T, 33, 2)), axis=0) + [640, 360]
        lm_l[:, :, :2] = base
        lm_r[:, :, :2] = base - [40.0, 0.0]
        lm_l[:, :, 3] = np.where(rng.random((T, 33)) < 0.15, 0.1, 0.99)
        lm_r[:, :, 3] = np.where(rng.random((T, 33)) < 0.15, 0.1, 0.99)

        tracker = StereoPoseTracker(rig)
        loop = np.stack([tracker.process_frame(lm_l[t], lm_r[t]) for t in range(T)])

        import jax.numpy as jnp

        scanned = np.asarray(
            fuse_pose_sequence(
                jnp.asarray(lm_l, jnp.float64),
                jnp.asarray(lm_r, jnp.float64),
                rig.as_arrays(),
            )
        )
        assert scanned.shape == (T, 13, 3)
        # NaN patterns must agree exactly; values to float64 fusion noise
        # (XLA associates/contracts FMAs differently inside scan).
        np.testing.assert_array_equal(np.isnan(scanned), np.isnan(loop))
        np.testing.assert_allclose(scanned, loop, rtol=1e-9, atol=1e-8)


class TestValidators:
    def test_baseline(self):
        r = validate_baseline(np.array([-500.0, 0, 0]), 505.0, tolerance_percent=2.0)
        assert r.passed and abs(r.error_percent - 100 * 5 / 505) < 1e-6


class TestDualCamera:
    def test_best_camera_selection_and_occlusion(self):
        from stereo_vision_tpu.track.dual_camera import analyze_dual_camera, occlusion_matrix
        from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES, ANGLE_NAMES

        T = 6
        rng = np.random.default_rng(0)
        lm = np.zeros((T, 33, 4))
        lm[:, :, :3] = rng.uniform(0, 1, (T, 33, 3))
        left = lm.copy()
        right = lm.copy()  # identical geometry -> identical angles
        left[:, :, 3] = 0.9
        right[:, :, 3] = 0.6
        # drop right camera's hip visibility entirely
        right[:, 23, 3] = 0.1
        res = analyze_dual_camera(left, right, conf_threshold=0.5)
        assert res.left_angles.shape == (T, 8)
        # left wins everywhere it is visible (higher confidence)
        finite = np.isfinite(res.combined_angles)
        assert np.all(res.chose_left[finite])
        stats = res.occlusion_stats
        # left_hip angle requires left_hip joint -> right camera occluded
        assert stats["left_hip"]["left_visible"] == T
        assert stats["left_hip"]["both_visible"] == 0
        m = occlusion_matrix(stats)
        assert m.shape == (8, 4) and m.sum() == 8 * T


class TestBallDrop:
    def test_gravity_recovery_from_stereo_detections(self):
        from stereo_vision_tpu.detect.ball import BallDetection
        from stereo_vision_tpu.track.ball import analyze_ball_drop, drop_report

        K = np.array([[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]])
        R = np.eye(3)
        Tv = np.array([-500.0, 0, 0])
        rig = StereoRig(K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8), R=R, T=Tv)
        P1, P2 = rig.P1, rig.P2

        fps, T = 240.0, 100
        t = np.arange(T) / fps
        g = 9800.0
        hold = 20  # stationary frames before release
        pos = np.zeros((T, 3))
        pos[:, 0] = 100.0
        pos[:, 2] = 3000.0
        pos[:, 1] = 200.0
        tt = np.clip(t - t[hold], 0, None)
        pos[:, 1] += 0.5 * g * tt**2  # y grows downward after release

        def proj(P, p):
            ph = np.concatenate([p, np.ones((len(p), 1))], 1)
            q = (P @ ph.T).T
            return q[:, :2] / q[:, 2:]

        lpix = proj(P1, pos)
        rpix = proj(P2, pos)
        ld = [BallDetection(x, y, 10.0, 0.9) for x, y in lpix]
        rd = [BallDetection(x, y, 10.0, 0.9) for x, y in rpix]
        ld[5] = None  # a dropped detection
        traj = analyze_ball_drop(rig, ld, rd, fps)
        assert traj.valid.sum() == T - 1
        assert traj.gravity_error_pct is not None
        assert traj.gravity_error_pct < 1.0
        rep = drop_report(traj, drop_height_mm=500.0)
        assert rep["expected_gravity_mm_s2"] == 9800.0
        assert abs(abs(rep["gravity_mm_s2"]) - 9800.0) < 100.0


class TestPoseWorkflow:
    def test_end_to_end_artifacts(self, tmp_path):
        from stereo_vision_tpu.track.pose_pipeline import run_pose_workflow
        from stereo_vision_tpu.track.joints import MEDIAPIPE_INDICES

        K = np.array([[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]])
        rig = StereoRig(K1=K, d1=np.zeros(8), K2=K, d2=np.zeros(8),
                        R=np.eye(3), T=np.array([-500.0, 0, 0]))
        P1, P2 = rig.P1, rig.P2
        T = 12
        rng = np.random.default_rng(0)
        gt = _synthetic_pose_sequence(T, noise=0.0)

        def proj(P, pts):
            ph = np.concatenate([pts, np.ones((len(pts), 1))], 1)
            q = (P @ ph.T).T
            return q[:, :2] / q[:, 2:]

        lm_l = np.zeros((T, 33, 4))
        lm_r = np.zeros((T, 33, 4))
        for t in range(T):
            lm_l[t, MEDIAPIPE_INDICES, :2] = proj(P1, gt[t]) + rng.normal(0, 0.3, (13, 2))
            lm_r[t, MEDIAPIPE_INDICES, :2] = proj(P2, gt[t]) + rng.normal(0, 0.3, (13, 2))
        lm_l[:, :, 3] = 0.95
        lm_r[:, :, 3] = 0.95

        res = run_pose_workflow(rig, lm_l, lm_r, out_dir=tmp_path, fps=30.0)
        assert res.poses_raw.shape == (T, 13, 3)
        err = np.nanmean(np.linalg.norm(res.poses_raw - gt, axis=-1))
        assert err < 10.0  # mm, with 0.3px detection noise at 3m
        assert np.isfinite(res.angles_smoothed).all()
        for name in ("pose_3d_original.pkl", "pose_3d_smoothed.pkl",
                     "joint_angles.csv", "smoothing_stats.json"):
            assert (tmp_path / name).exists()
