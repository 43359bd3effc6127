"""CLI smoke tests (disparity command end-to-end on tiny images)."""

import json

import cv2
import numpy as np

from stereo_vision_tpu.pipeline.cli import build_parser, main


def test_parser_covers_commands():
    p = build_parser()
    for cmd in ("intrinsic", "extrinsic", "rectify", "sync", "disparity", "stream", "bench"):
        assert cmd in p.format_help()


def test_disparity_command(tmp_path, capsys, rng):
    base = rng.integers(0, 255, (96, 160)).astype(np.uint8)
    # d=6: left[x] matches right[x-6] -> right content shifted left
    left = base[:, 16:144]
    right = base[:, 22:150]
    cv2.imwrite(str(tmp_path / "l.png"), left)
    cv2.imwrite(str(tmp_path / "r.png"), right)
    rc = main(
        [
            "disparity",
            "--test-dir", str(tmp_path),
            "--left", str(tmp_path / "l.png"),
            "--right", str(tmp_path / "r.png"),
            "--matcher", "bm",
            "--num-disparities", "16",
            "--block-size", "9",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # small frame: the left D+window margin plus uniqueness culls a lot
    assert out["valid_fraction"] > 0.1
    assert abs(out["mean_disparity"] - 6.0) < 1.0
    d = np.load(tmp_path / "results" / "disparity" / "disparity.npy")
    assert d.shape == left.shape
