"""Host ingestion throughput: serial decode loop vs the native ring loader.

The reference's ingestion is decode->convert->compute serialized on one
core (3dpose.py:358). This measures, on a rendered 720p clip:

  serial    — iter_frames + pack_gray + per-window "compute" in one loop
              (the reference's shape)
  prefetch  — VideoPrefetcher (decode thread + C++ ring with in-slot
              OpenMP gray pack) overlapping the same compute

with compute simulated as a busy-wait of the headline per-window device
time (8-frame hier pack ≈ 30 ms — docs/sgbm_roofline.md), so the number
reported is how much of the decode cost the pipeline hides. CPU-only.

CAVEAT (this environment): the dev box exposes ONE cpu
(multiprocessing.cpu_count() == 1), so decode / pack / compute threads
serialize and the measured overlap here is a floor, not the design
point — on a real serving host the decode thread, the OpenMP pack, and
the device dispatch run on separate cores and the ring hides ingestion
completely whenever decode fps >= device fps. Measured on this box
(2026-08-19): serial 39 fps -> prefetch 50 fps on a 96-frame 720p clip
(1.28x even time-sliced); cv2 seek-interleaved multi-worker decode was
probed and REJECTED (seeks cost more than they parallelize: 33 fps vs
96 serial at 1 cpu — and the many-camera serving shape gets decode
parallelism from one thread per stream anyway, see io/loader.py).

Usage: python benchmarks/loader_bench.py [--frames 96] [--compute-ms 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def busy_wait(seconds: float) -> None:
    end = time.perf_counter() + seconds
    while time.perf_counter() < end:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--compute-ms", type=float, default=30.0)
    ap.add_argument("--size", default="1280x720")
    args = ap.parse_args()
    W, H = map(int, args.size.split("x"))
    T = args.frames

    import tempfile
    from pathlib import Path

    from stereo_vision_tpu import native
    from stereo_vision_tpu.io.loader import VideoPrefetcher
    from stereo_vision_tpu.io.video import iter_frames, write_video

    rng = np.random.default_rng(0)
    # Textured moving scene (compressible but non-trivial to decode).
    base = rng.integers(0, 255, (H + 64, W + 64, 3)).astype(np.uint8)
    frames = np.stack([base[i % 64 :, i % 64 :][:H, :W] for i in range(T)])
    path = Path(tempfile.mkdtemp()) / "clip.mp4"
    write_video(path, frames, fps=30)
    compute_s = args.compute_ms / 1e3
    n_windows = T // args.window

    # --- serial reference loop -----------------------------------------
    t0 = time.perf_counter()
    buf, count, done = [], 0, 0
    for _, f in iter_frames(path, max_frames=n_windows * args.window):
        buf.append(f)
        if len(buf) == args.window:
            native.pack_gray(np.stack(buf))
            busy_wait(compute_s)
            buf, done = [], done + 1
    serial_s = time.perf_counter() - t0

    # --- prefetching loader ---------------------------------------------
    t0 = time.perf_counter()
    got = 0
    for seq, win, n in VideoPrefetcher(
        path, args.window, max_frames=n_windows * args.window
    ):
        busy_wait(compute_s)
        got += 1
    prefetch_s = time.perf_counter() - t0

    n_frames = n_windows * args.window
    compute_total = n_windows * compute_s
    out = {
        "native_ring": native.frame_ring_module() is not None,
        "frames": n_frames,
        "serial_fps": round(n_frames / serial_s, 1),
        "prefetch_fps": round(n_frames / prefetch_s, 1),
        "speedup": round(serial_s / prefetch_s, 3),
        "ingest_overhead_hidden_pct": round(
            100.0 * (1 - max(prefetch_s - compute_total, 0.0)
                     / max(serial_s - compute_total, 1e-9)),
            1,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
