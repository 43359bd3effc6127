"""Pipeline tests: config round-trip, artifact-store reference-schema
interop, stage orchestration with gates, sharded streaming."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereo_vision_tpu.pipeline import (
    PipelineConfig,
    BoardConfig,
    ArtifactStore,
    PipelineGateError,
    run_intrinsic_stage,
    run_extrinsic_stage,
    run_rectification_stage,
    run_sync_stage,
)
from stereo_vision_tpu.parallel import (
    create_mesh,
    batched_stereo_pipeline,
    make_sharded_pipeline,
    StereoStreamProcessor,
)
from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map


class TestConfig:
    def test_json_roundtrip(self):
        cfg = PipelineConfig(board=BoardConfig(9, 6, 25.0))
        cfg2 = PipelineConfig.from_json(cfg.to_json())
        assert cfg2.board.cols == 9 and cfg2.board.square_mm == 25.0
        assert cfg2.track.confidence_threshold == 0.65

    def test_defaults_match_reference(self):
        cfg = PipelineConfig()
        # intrinsic.py:452-467 defaults
        assert cfg.board.size == (7, 4) and cfg.board.square_mm == 100.0
        assert cfg.frames.interval == 15 and cfg.frames.max_frames == 20
        # 3dpose.py:69-71
        assert cfg.track.temporal_filter_weight == 0.7


class TestArtifactStore:
    def test_reference_schema_roundtrip(self, tmp_path):
        store = ArtifactStore(tmp_path)
        K = np.array([[1000.0, 0, 640], [0, 1000, 360], [0, 0, 1]])
        d = np.array([-0.1, 0.02, 0.0, 0.0, 0.001, 0, 0, 0])
        store.save_intrinsics("left", K, d, rms=0.4)
        store.save_intrinsics("right", K, d)
        R = np.eye(3)
        T = np.array([-500.0, 0, 0])
        store.save_extrinsics(R, T, E=np.eye(3), F=np.eye(3))
        # files exist under the reference layout
        assert (tmp_path / "results/intrinsic_params/left_matrix.txt").exists()
        assert (tmp_path / "results/extrinsic_params/stereo_rotation_matrix.txt").exists()
        rig = store.load_rig()
        np.testing.assert_allclose(rig.K1, K)
        np.testing.assert_allclose(rig.T.ravel(), T)

    def test_txt_fallback(self, tmp_path):
        store = ArtifactStore(tmp_path)
        K = np.eye(3) * 900
        K[2, 2] = 1
        store.save_intrinsics("left", K, np.zeros(8))
        # drop the pickle -> loader must fall back to txt (ball_drop.py:176-189)
        (tmp_path / "results/intrinsic_params/left_intrinsics.pkl").unlink()
        K2, d2 = store.load_intrinsics("left")
        np.testing.assert_allclose(K2, K)

    def test_sync_cache(self, tmp_path):
        store = ArtifactStore(tmp_path)
        assert store.load_sync() is None
        store.save_sync(40, 47, 7)
        s = store.load_sync()
        assert s["frame_offset"] == 7


def _project_board(K, dist, rvec, tvec, obj):
    from stereo_vision_tpu.ops.distortion import project_points

    return np.asarray(
        project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec),
                       jnp.asarray(K), jnp.asarray(dist))
    )


class TestStages:
    def test_sync_stage(self, tmp_path):
        rng = np.random.default_rng(0)
        T, H, W = 80, 12, 12
        left = np.clip(40 + rng.normal(0, 2, (T, H, W)), 0, 255).astype(np.uint8)
        right = left.copy()
        left[30] = 200
        right[35] = 200
        store = ArtifactStore(tmp_path)
        rep = run_sync_stage(store, PipelineConfig(), left, right)
        assert rep.metrics["offset"] == 5
        assert store.load_sync()["frame_offset"] == 5
        assert rep.metrics["sync_ms"] > 0  # per-stage timing (SURVEY §5)

    def test_rectification_stage(self, tmp_path):
        store = ArtifactStore(tmp_path)
        K = np.array([[1000.0, 0, 640], [0, 1000, 360], [0, 0, 1]])
        store.save_intrinsics("left", K, np.zeros(8))
        store.save_intrinsics("right", K, np.zeros(8))
        store.save_extrinsics(np.eye(3), np.array([-500.0, 0, 0]))
        rep = run_rectification_stage(store, (1280, 720))
        assert rep.status == "pass"
        assert rep.metrics["rectify_ms"] > 0 and rep.metrics["maps_mpx_per_s"] > 0
        R1, R2, P1, P2, Q = store.load_rectification()
        assert R1.shape == (3, 3) and Q.shape == (4, 4)

    def test_extrinsic_gate_fails_on_garbage(self, tmp_path):
        store = ArtifactStore(tmp_path)
        K = np.array([[1000.0, 0, 640], [0, 1000, 360], [0, 0, 1]])
        store.save_intrinsics("left", K, np.zeros(8))
        store.save_intrinsics("right", K, np.zeros(8))
        rng = np.random.default_rng(1)
        junk = rng.uniform(0, 1000, (6, 28, 2))
        with pytest.raises(PipelineGateError):
            run_extrinsic_stage(store, PipelineConfig(), junk, junk + rng.uniform(0, 50, junk.shape))


class TestShardedStreaming:
    @pytest.fixture(scope="class")
    def setup(self):
        K = jnp.array([[300.0, 0, 96.0], [0, 300.0, 64.0], [0, 0, 1.0]])
        dist = jnp.zeros(8)
        R = jnp.eye(3)
        T = jnp.array([-100.0, 0.0, 0.0])
        size = (192, 128)  # (W, H)
        R1, R2, P1, P2, Q = stereo_rectify(K, dist, K, dist, size, R, T, alpha=0.0)
        mx1, my1 = init_undistort_rectify_map(K, dist, R1, P1, size)
        mx2, my2 = init_undistort_rectify_map(K, dist, R2, P2, size)
        return (mx1, my1, mx2, my2), Q

    def test_batched_pipeline_shapes(self, setup):
        maps, Q = setup
        rng = np.random.default_rng(0)
        B, H, W = 2, 128, 192
        left = jnp.asarray(rng.integers(0, 255, (B, H, W)), jnp.int32)
        right = jnp.asarray(rng.integers(0, 255, (B, H, W)), jnp.int32)
        from stereo_vision_tpu.stereo.bm import StereoBMParams

        disp, pts = batched_stereo_pipeline(
            left, right, maps, Q, matcher="bm",
            params=StereoBMParams(num_disparities=16, block_size=9),
        )
        assert disp.shape == (B, H, W)
        assert pts.shape == (B, H, W, 3)

    def test_sharded_pipeline_runs_on_mesh(self, setup, cpu_mesh):
        maps, Q = setup
        rng = np.random.default_rng(1)
        B, H, W = 4, 128, 192
        left = rng.integers(0, 255, (B, H, W)).astype(np.int32)
        right = rng.integers(0, 255, (B, H, W)).astype(np.int32)
        from stereo_vision_tpu.stereo.bm import StereoBMParams

        mesh = create_mesh(4, 1, devices=list(cpu_mesh.devices.ravel()))
        run = make_sharded_pipeline(
            mesh, maps, Q, matcher="bm",
            params=StereoBMParams(num_disparities=16, block_size=9),
        )
        disp, pts = run(left, right)
        assert disp.shape == (B, H, W)

    def test_stream_processor_double_buffer(self, setup, cpu_mesh):
        maps, Q = setup
        from stereo_vision_tpu.stereo.bm import StereoBMParams

        mesh = create_mesh(4, 1, devices=list(cpu_mesh.devices.ravel()))
        proc = StereoStreamProcessor(
            mesh, maps, Q, matcher="bm",
            params=StereoBMParams(num_disparities=16, block_size=9),
        )
        rng = np.random.default_rng(2)
        for _ in range(3):
            l = rng.integers(0, 255, (4, 128, 192)).astype(np.int32)
            proc.submit(l, l)
        disp, pts = proc.drain()
        assert disp.shape == (4, 128, 192)
        assert proc.drain() is None


def test_sharded_sgbm_streams(cpu_mesh):
    """BASELINE config #5 with the SGBM matcher: frame-parallel over the
    data axis is the exact multi-chip decomposition of dense stereo (the
    directional scans make spatial tiling sequential across chips)."""
    import jax.numpy as jnp
    from stereo_vision_tpu.parallel import create_mesh, make_sharded_pipeline
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map

    K = jnp.array([[200.0, 0, 48.0], [0, 200.0, 32.0], [0, 0, 1.0]])
    dist = jnp.zeros(8)
    size = (96, 64)
    R1, R2, P1, P2, Q = stereo_rectify(
        K, dist, K, dist, size, jnp.eye(3), jnp.array([-50.0, 0.0, 0.0]), alpha=0.0
    )
    maps = (
        *init_undistort_rectify_map(K, dist, R1, P1, size),
        *init_undistort_rectify_map(K, dist, R2, P2, size),
    )
    mesh = create_mesh(4, 1, devices=list(cpu_mesh.devices.ravel()))
    run = make_sharded_pipeline(
        mesh, maps[:4], Q, matcher="sgbm",
        params=StereoSGBMParams(num_disparities=16, block_size=3, backend="scan"),
    )
    rng = np.random.default_rng(0)
    l = rng.integers(0, 255, (4, 64, 96)).astype(np.int32)
    disp, pts = run(l, l)
    assert disp.shape == (4, 64, 96)
    assert pts.shape == (4, 64, 96, 3)


def test_streaming_sgbm_hier_matcher():
    """The lane-packed hier matcher branch of batched_stereo_pipeline must
    equal remap-then-stereo_sgbm_hier_batch done by hand (it is pure glue:
    vmapped remap + rounding + the packed banded kernels + Q-reprojection).
    Pack count is fixed at 128 // band = 4 frames."""
    import jax
    import jax.numpy as jnp
    from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map
    from stereo_vision_tpu.ops.remap import make_remap
    from stereo_vision_tpu.parallel.streaming import batched_stereo_pipeline
    from stereo_vision_tpu.stereo.hier import HierParams, stereo_sgbm_hier_batch
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams

    K = jnp.array([[300.0, 0, 112.0], [0, 300.0, 48.0], [0, 0, 1.0]])
    dist = jnp.zeros(8)
    size = (224, 96)  # (W, H): W > D = 128 so a valid region exists
    R1, R2, P1, P2, Q = stereo_rectify(
        K, dist, K, dist, size, jnp.eye(3), jnp.array([-50.0, 0.0, 0.0]), alpha=0.0
    )
    maps = (
        *init_undistort_rectify_map(K, dist, R1, P1, size),
        *init_undistort_rectify_map(K, dist, R2, P2, size),
    )
    params = StereoSGBMParams(
        num_disparities=128, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=20, speckle_range=2, num_paths=4,
    )
    rng = np.random.default_rng(3)
    l = rng.integers(0, 255, (4, 96, 224)).astype(np.int32)
    r = rng.integers(0, 255, (4, 96, 224)).astype(np.int32)

    disp, pts = batched_stereo_pipeline(
        l, r, maps[:4], Q, matcher="sgbm_hier", params=params
    )
    assert disp.shape == (4, 96, 224)
    assert pts.shape == (4, 96, 224, 3)

    def prep(mx, my, batch):
        m = make_remap(mx, my, (96, 224))
        one = lambda x: jnp.round(m(x.astype(jnp.float32))).astype(jnp.int32)
        return jax.vmap(one)(batch)

    lr = prep(maps[0], maps[1], jnp.asarray(l))
    rr = prep(maps[2], maps[3], jnp.asarray(r))
    ref = stereo_sgbm_hier_batch(lr, rr, params, HierParams(), interpret=True)
    np.testing.assert_array_equal(np.asarray(disp), np.asarray(ref))


def test_sharded_hier_matches_unsharded():
    """make_sharded_pipeline(matcher='sgbm_hier') runs each device's
    128-lane pack under shard_map over the data axis; the result must
    equal per-pack batched_stereo_pipeline exactly (frame-parallel: no
    cross-device traffic, so sharding must be a pure layout change)."""
    import jax
    import jax.numpy as jnp
    from stereo_vision_tpu.ops.rectify import (
        stereo_rectify,
        init_undistort_rectify_map,
    )
    from stereo_vision_tpu.parallel.mesh import create_mesh
    from stereo_vision_tpu.parallel.streaming import (
        batched_stereo_pipeline,
        make_sharded_pipeline,
    )
    from stereo_vision_tpu.stereo.hier import HIER_FAST
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams

    K = jnp.array([[300.0, 0, 96.0], [0, 300.0, 24.0], [0, 0, 1.0]])
    dist = jnp.zeros(8)
    size = (192, 48)  # (W, H), W > D = 64
    R1, R2, P1, P2, Q = stereo_rectify(
        K, dist, K, dist, size, jnp.eye(3), jnp.array([-50.0, 0.0, 0.0]),
        alpha=0.0,
    )
    maps = (
        *init_undistort_rectify_map(K, dist, R1, P1, size),
        *init_undistort_rectify_map(K, dist, R2, P2, size),
    )
    params = StereoSGBMParams(
        num_disparities=64, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=20, speckle_range=2,
        num_paths=4,
    )
    mesh = create_mesh(2, 1)
    run = make_sharded_pipeline(
        mesh, maps[:4], Q, matcher="sgbm_hier", params=params,
        hier_params=HIER_FAST,
    )
    rng = np.random.default_rng(9)
    B = 16  # 2 devices x 8-frame packs (HIER_FAST band 16)
    l = rng.integers(0, 255, (B, 48, 192)).astype(np.int32)
    r = rng.integers(0, 255, (B, 48, 192)).astype(np.int32)
    disp, pts = run(jnp.asarray(l), jnp.asarray(r))

    for i in range(0, B, 8):
        ref, refp = batched_stereo_pipeline(
            jnp.asarray(l[i : i + 8]), jnp.asarray(r[i : i + 8]),
            maps[:4], Q, matcher="sgbm_hier", params=params,
            hier_params=HIER_FAST,
        )
        np.testing.assert_array_equal(
            np.asarray(disp[i : i + 8]), np.asarray(ref), err_msg=f"pack {i}"
        )
        np.testing.assert_array_equal(
            np.asarray(pts[i : i + 8]), np.asarray(refp), err_msg=f"pack {i}"
        )
