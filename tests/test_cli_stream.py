"""`stream` CLI: video pair -> native-ring decode -> sharded remap+matcher+Q.

The user-facing form of BASELINE config #5 (the reference's per-frame
`while cap.isOpened()` loops, 3dpose.py:358 / ball_drop.py:380, replaced
by windowed device programs). Exercises artifact loading (rig +
rectification + maps.npy), the stored flash offset, and the summary JSON.
"""

import json

import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.io.video import write_video
from stereo_vision_tpu.ops.rectify import init_undistort_rectify_map, stereo_rectify
from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
from stereo_vision_tpu.pipeline.cli import main


def test_stream_command(tmp_path, capsys):
    rng = np.random.default_rng(7)
    T, H, W, D = 8, 64, 96, 4
    base = rng.integers(0, 255, (H, W + 2 * D, 3)).astype(np.uint8)
    # Constant disparity D: left[x] matches right[x - D] (right content
    # shifted left, the repo-wide convention).
    frames_l = np.stack([base[:, D : W + D]] * T)
    frames_r = np.stack([base[:, 2 * D : W + 2 * D]] * T)
    pl = write_video(tmp_path / "l.mp4", frames_l, fps=10)
    pr = write_video(tmp_path / "r.mp4", frames_r, fps=10)

    K = np.array([[200.0, 0, 48.0], [0, 200.0, 32.0], [0, 0, 1.0]])
    dist = np.zeros(8)
    Tvec = np.array([-50.0, 0.0, 0.0])
    store = ArtifactStore(tmp_path)
    store.save_intrinsics("left", K, dist)
    store.save_intrinsics("right", K, dist)
    store.save_extrinsics(np.eye(3), Tvec)
    R1, R2, P1, P2, Q = stereo_rectify(
        jnp.asarray(K), jnp.asarray(dist), jnp.asarray(K), jnp.asarray(dist),
        (W, H), jnp.eye(3), jnp.asarray(Tvec), alpha=0.0,
    )
    store.save_rectification(R1, R2, P1, P2, Q)
    mx1, my1 = init_undistort_rectify_map(jnp.asarray(K), jnp.asarray(dist), R1, P1, (W, H))
    mx2, my2 = init_undistort_rectify_map(jnp.asarray(K), jnp.asarray(dist), R2, P2, (W, H))
    np.save(store.rectify_dir / "maps.npy",
            np.stack([np.asarray(m) for m in (mx1, my1, mx2, my2)]))

    rc = main([
        "stream",
        "--test-dir", str(tmp_path),
        "--left", str(pl),
        "--right", str(pr),
        "--matcher", "bm",
        "--num-disparities", "16",
        "--block-size", "9",
        "--devices", "4",
        "--window", "4",
        "--video-out", str(tmp_path / "disp.mp4"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == T and out["size"] == [W, H]
    assert out["fps"] > 0 and out["mpx_per_s"] > 0
    assert (tmp_path / "disp.mp4").exists()

    per_frame = json.load(open(out["stats"]))
    assert len(per_frame) == T
    # Expected depth of the constant-D plane through the saved Q:
    # [.., Z, Wh] = Q @ [x, y, d, 1] -> z = Q[2,3] / (Q[3,2] d + Q[3,3]).
    Qn = np.asarray(Q)
    z_exp = Qn[2, 3] / (Qn[3, 2] * D + Qn[3, 3])
    for f in per_frame:
        assert f["valid_fraction"] > 0.3
        assert abs(f["median_depth_mm"] - z_exp) / z_exp < 0.05


def test_stream_stats_only(tmp_path, capsys):
    """Without --video-out the stream computes per-frame stats ON DEVICE
    (streaming._frame_stats) and ships two floats per frame; the summary
    and per-frame records must match the full-transfer path's semantics
    (valid = d > 0, median over valid depths)."""
    rng = np.random.default_rng(11)
    T, H, W, D = 6, 64, 96, 4
    base = rng.integers(0, 255, (H, W + 2 * D, 3)).astype(np.uint8)
    frames_l = np.stack([base[:, D : W + D]] * T)
    frames_r = np.stack([base[:, 2 * D : W + 2 * D]] * T)
    pl = write_video(tmp_path / "l.mp4", frames_l, fps=10)
    pr = write_video(tmp_path / "r.mp4", frames_r, fps=10)

    K = np.array([[200.0, 0, 48.0], [0, 200.0, 32.0], [0, 0, 1.0]])
    dist = np.zeros(8)
    Tvec = np.array([-50.0, 0.0, 0.0])
    store = ArtifactStore(tmp_path)
    store.save_intrinsics("left", K, dist)
    store.save_intrinsics("right", K, dist)
    store.save_extrinsics(np.eye(3), Tvec)
    R1, R2, P1, P2, Q = stereo_rectify(
        jnp.asarray(K), jnp.asarray(dist), jnp.asarray(K), jnp.asarray(dist),
        (W, H), jnp.eye(3), jnp.asarray(Tvec), alpha=0.0,
    )
    store.save_rectification(R1, R2, P1, P2, Q)
    mx1, my1 = init_undistort_rectify_map(jnp.asarray(K), jnp.asarray(dist), R1, P1, (W, H))
    mx2, my2 = init_undistort_rectify_map(jnp.asarray(K), jnp.asarray(dist), R2, P2, (W, H))
    np.save(store.rectify_dir / "maps.npy",
            np.stack([np.asarray(m) for m in (mx1, my1, mx2, my2)]))

    rc = main([
        "stream",
        "--test-dir", str(tmp_path),
        "--left", str(pl),
        "--right", str(pr),
        "--matcher", "bm",
        "--num-disparities", "16",
        "--block-size", "9",
        "--devices", "2",
        "--window", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == T
    per_frame = json.load(open(out["stats"]))
    assert len(per_frame) == T
    Qn = np.asarray(Q)
    z_exp = Qn[2, 3] / (Qn[3, 2] * D + Qn[3, 3])
    for f in per_frame:
        assert f["valid_fraction"] > 0.3
        assert abs(f["median_depth_mm"] - z_exp) / z_exp < 0.05
