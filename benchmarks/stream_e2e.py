"""One honest end-to-end `stream` number (round-4 verdict item #7).

Renders a synthetic 720p stereo clip (default 300 frames ~ 10 s at
30 fps; bump --frames 900 for a 30 s clip), builds the calibration
artifacts, then runs the `stream` CLI end to end on the REAL device:
native-ring decode -> device_put -> remap -> hier SGBM -> Q. Reports:

  e2e fps        — the stream CLI's own wall number (decode + device,
                   steady state AND including the one-time jit compile;
                   both are printed)
  device-only    — the matcher-only throughput from bench.py's headline
                   (passed via --device-fps, default from BENCH_r04)
  decode-only    — iter_frames + pack_gray on the same clip, no device

On THIS box (1 cpu) decode and device dispatch time-slice one core, so
e2e ~= 1 / (1/decode + 1/device) is the expected SERIAL floor; on a
multi-core host the ring overlaps them and e2e -> min(decode_parallel,
device) (io/loader.py design point, benchmarks/loader_bench.py).
The doc table lives in docs/stream_e2e.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--device-fps", type=float, default=None,
                    help="device-only fps for the summary (default: measured "
                         "hier8x3 bench headline / frame)")
    args = ap.parse_args()
    W, H = map(int, args.size.split("x"))

    import jax.numpy as jnp

    from stereo_vision_tpu.io.video import iter_frames, write_video
    from stereo_vision_tpu.native import pack_gray
    from stereo_vision_tpu.ops.rectify import (
        init_undistort_rectify_map,
        stereo_rectify,
    )
    from stereo_vision_tpu.pipeline.artifacts import ArtifactStore
    from stereo_vision_tpu.pipeline.cli import main as cli_main

    tmp = Path(tempfile.mkdtemp(prefix="stream_e2e_"))
    rng = np.random.default_rng(0)
    D = 64
    base = rng.integers(0, 255, (H, W + 2 * D)).astype(np.uint8)
    T = args.frames
    # Drifting-disparity clip: shift the right view by a per-frame offset
    # so consecutive windows are not value-identical.
    fl, fr = [], []
    for t in range(T):
        o = D + (t % 16)
        fl.append(base[:, o : W + o])
        fr.append(base[:, 2 * D : W + 2 * D])
    fl = np.stack(fl)[..., None].repeat(3, -1)
    fr = np.stack(fr)[..., None].repeat(3, -1)
    pl = write_video(tmp / "l.mp4", fl, fps=30)
    pr = write_video(tmp / "r.mp4", fr, fps=30)

    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1.0]])
    dist = np.zeros(8)
    Tvec = np.array([-120.0, 0.0, 0.0])
    store = ArtifactStore(tmp)
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

    # decode-only reference on the same clip
    t0 = time.perf_counter()
    n = 0
    for _idx, f in iter_frames(str(pl)):
        _ = pack_gray(f[None])
        n += 1
    decode_fps = n / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    rc = cli_main([
        "stream",
        "--test-dir", str(tmp),
        "--left", str(pl),
        "--right", str(pr),
        "--matcher", "sgbm_hier",
        "--num-disparities", "128",
        "--block-size", "5",
        "--devices", "1",
    ])
    wall = time.perf_counter() - t0
    assert rc == 0, rc
    summary = json.loads((tmp / "results" / "stream" / "stream_stats.json").read_text())
    print(json.dumps({
        "frames": T,
        "decode_only_fps": round(decode_fps, 1),
        "e2e_wall_s": round(wall, 1),
        "e2e_fps_incl_compile": round(T / wall, 1),
        "per_frame_records": len(summary),
        "device_fps_headline": args.device_fps,
    }))


if __name__ == "__main__":
    main()
