"""Aux subsystems: detection cache, frame mapper, checkpointing."""

import numpy as np

from stereo_vision_tpu.detect.cache import DetectionCache, image_hash
from stereo_vision_tpu.sync.mapper import StereoFrameMapper


class TestDetectionCache:
    def test_memoization_and_persistence(self, tmp_path, rng):
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        calls = []

        def detector(im):
            calls.append(1)
            return {"cx": 1.0}

        cache = DetectionCache(tmp_path / "det.pkl")
        f = cache.cached(detector)
        assert f(img) == {"cx": 1.0}
        assert f(img) == {"cx": 1.0}
        assert len(calls) == 1  # second call was cached
        cache.save()
        cache2 = DetectionCache(tmp_path / "det.pkl")
        assert cache2.get(img) == {"cx": 1.0}

    def test_hash_distinguishes(self, rng):
        a = rng.integers(0, 255, (4, 4)).astype(np.uint8)
        b = a.copy(); b[0, 0] ^= 1
        assert image_hash(a) != image_hash(b)


class TestFrameMapper:
    def test_mapping_and_range(self):
        m = StereoFrameMapper(offset=7, left_count=100, right_count=100)
        assert m.left_to_right(0) == 7
        assert m.right_to_left(7) == 0
        assert m.left_to_right(95) is None  # right would be 102
        start, stop = m.valid_range()
        assert start == 0 and stop == 93
        pairs = list(m.pairs())
        assert pairs[0] == (0, 7) and pairs[-1] == (92, 99)

    def test_negative_offset(self):
        m = StereoFrameMapper(offset=-5, left_count=50, right_count=50)
        assert m.left_to_right(2) is None
        assert m.left_to_right(5) == 0
        start, _ = m.valid_range()
        assert start == 5

    def test_roundtrip(self, tmp_path):
        m = StereoFrameMapper(3, 10, 20)
        m.save(tmp_path / "sync.json")
        m2 = StereoFrameMapper.load(tmp_path / "sync.json")
        assert m2.offset == 3 and m2.right_count == 20


def test_numpy_tree_checkpoint(tmp_path):
    import jax.numpy as jnp
    from stereo_vision_tpu.models.checkpoint import save_numpy_tree

    tree = {"params": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
    save_numpy_tree(tmp_path / "ckpt.npz", tree)
    loaded = np.load(tmp_path / "ckpt.npz")
    assert len(loaded.files) == 2


class TestPairFiltering:
    def test_drops_corrupted_pair(self):
        import cv2
        import sys
        sys.path.insert(0, "tests")
        from test_calibration import render_board_views, K_TRUE, DIST_TRUE, SIZE
        from stereo_vision_tpu.calib.pairs import filter_pairs_by_rms

        R_true, _ = cv2.Rodrigues(np.array([0.02, -0.3, 0.01]))
        T_true = np.array([-3400.0, 25.0, 80.0])
        obj, c1, _, c2 = render_board_views(n_frames=8, seed=21, stereo_RT=(R_true, T_true))
        c2 = c2.copy()
        c2[3] += 12.0  # corrupt one pair's right corners
        idx, f1, f2 = filter_pairs_by_rms(
            obj, c1, c2, K_TRUE, DIST_TRUE, K_TRUE, DIST_TRUE, SIZE, max_rms=2.0
        )
        assert 3 not in idx
        assert len(idx) >= 5


class TestSingleCamera:
    def test_angles_and_stats(self, rng):
        from stereo_vision_tpu.track.single_camera import analyze_single_camera
        T = 8
        lm = np.zeros((T, 33, 4))
        lm[:, :, :3] = rng.uniform(0, 1, (T, 33, 3))
        lm[:, :, 3] = 0.9
        res = analyze_single_camera(lm)
        assert res.angles.shape == (T, 8)
        assert np.isfinite(res.angles).all()
        assert all(s["visible_fraction"] == 1.0 for s in res.stats.values())


class TestFilenames:
    def test_distance_extraction(self):
        from stereo_vision_tpu.utils.filenames import extract_distance_from_filename
        assert extract_distance_from_filename("ball_2000mm.png") == 2000.0
        assert extract_distance_from_filename("dist_250cm_left.MOV") == 2500.0
        assert extract_distance_from_filename("validate_3.5m.mp4") == 3500.0
        assert extract_distance_from_filename("clip_2.5.mp4") == 2500.0
        assert extract_distance_from_filename("no_distance_here.mp4") is None


class TestVideoIO:
    def test_write_read_roundtrip(self, tmp_path, rng):
        from stereo_vision_tpu.io.video import write_video, extract_frames, video_info

        frames = rng.integers(0, 255, (10, 32, 48, 3)).astype(np.uint8)
        p = write_video(tmp_path / "clip.mp4", frames, fps=30.0)
        info = video_info(p)
        assert info["frame_count"] == 10
        assert (info["width"], info["height"]) == (48, 32)
        back, idx = extract_frames(p, interval=1, max_frames=10)
        assert back.shape[0] == 10

    def test_synchronized_writer(self, tmp_path, rng):
        from stereo_vision_tpu.io.video import write_video, create_synchronized_videos, video_info

        frames = rng.integers(0, 255, (20, 16, 24, 3)).astype(np.uint8)
        l = write_video(tmp_path / "l.mp4", frames)
        r = write_video(tmp_path / "r.mp4", frames)
        lp, rp = create_synchronized_videos(l, r, 5, 8, tmp_path / "out", duration_frames=10)
        assert video_info(lp)["frame_count"] == 10
        assert video_info(rp)["frame_count"] == 10


class TestProfiling:
    """utils/profiling: the measurement helpers (SURVEY §5 tracing row)."""

    def test_time_jitted_measures_and_chains(self):
        import jax.numpy as jnp

        from stereo_vision_tpu.utils.profiling import time_jitted

        x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
        dt = time_jitted(lambda a: a @ a.T + 1.0, (x,), n=3)
        assert 0.0 < dt < 10.0

    def test_time_jitted_perturbs_first_non_bool(self):
        """A boolean first argument must not crash; the bump lands on the
        first numeric leaf instead (round-2 review finding)."""
        import jax.numpy as jnp

        from stereo_vision_tpu.utils.profiling import time_jitted

        mask = jnp.ones((8, 8), bool)
        x = jnp.ones((8, 8), jnp.float32)
        dt = time_jitted(lambda m, a: jnp.where(m, a, 0.0).sum()[None, None], (mask, x), n=2)
        assert dt > 0.0

    def test_time_jitted_all_bool_raises(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from stereo_vision_tpu.utils.profiling import time_jitted

        m = jnp.ones((4, 4), bool)
        with _pytest.raises(ValueError, match="perturb"):
            time_jitted(lambda a: (~a).astype(jnp.float32), (m,), n=2)

    def test_stage_timer_accumulates(self):
        import time as _t

        from stereo_vision_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t("work", pixels=1_000_000):
            _t.sleep(0.01)
        with t("work"):
            _t.sleep(0.01)
        m = t.metrics
        assert m["work_ms"] >= 20.0 * 0.5  # two accumulated sleeps
        assert m["work_mpx_per_s"] > 0

    def test_trace_writes_profile(self, tmp_path):
        import jax.numpy as jnp

        from stereo_vision_tpu.utils.profiling import trace

        with trace(str(tmp_path)):
            _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
        files = list(tmp_path.rglob("*"))
        assert files, "trace directory is empty"
