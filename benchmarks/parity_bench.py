"""BASELINE.json config harness: parity + throughput per config.

Throughput note: per-config mpx_per_s here times a single re-dispatch and
can be distorted by the remote-TPU tunnel; bench.py's chained-in-jit number
is the authoritative throughput. Parity/agreement numbers are exact.

Runs the five BASELINE configs on synthetic scenes (the image has no
Middlebury data and no network egress; the synthetic generator produces
rectified pairs with known ground-truth disparity, textured + foreground
box, same as tests/test_stereo_parity.py) and prints one JSON line per
config with agreement vs cv2, EPE, and Mpx/s.

Usage: python benchmarks/parity_bench.py [--configs 1 2 3] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def _agreement(mine, ref16, invalid_val=-1.0):
    ref = ref16.astype(np.float32) / 16.0
    ref_valid = ref16 > (invalid_val * 16)
    my_valid = mine > invalid_val
    both_valid = ref_valid & my_valid
    both_invalid = ~ref_valid & ~my_valid
    close = np.abs(mine - ref) <= 1.0
    agree = float((both_invalid | (both_valid & close)).mean())
    epe = float(np.abs(mine[both_valid] - ref[both_valid]).mean()) if both_valid.any() else None
    return agree, epe


def _time_once(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = np.asarray(fn(*args))
    return out, time.perf_counter() - t0


def config1() -> dict:
    """StereoBM 640x480 D=64 block 15 vs cv2."""
    import cv2
    import jax.numpy as jnp
    from test_stereo_parity import synthetic_pair
    from stereo_vision_tpu.stereo import StereoBMParams, stereo_bm

    left, right, _ = synthetic_pair(h=480, w=640, max_disp=64, seed=11)
    p = StereoBMParams(num_disparities=64, block_size=15)
    bm = cv2.StereoBM_create(64, 15)
    bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
    bm.setPreFilterCap(p.prefilter_cap)
    bm.setTextureThreshold(p.texture_threshold)
    bm.setUniquenessRatio(p.uniqueness_ratio)
    ref = bm.compute(left, right)
    import jax

    fn = jax.jit(lambda l, r: stereo_bm(l, r, p))
    mine, dt = _time_once(fn, jnp.asarray(left, jnp.int32), jnp.asarray(right, jnp.int32))
    agree, epe = _agreement(mine, ref)
    return {
        "config": "1_bm_640x480_d64",
        "agreement": round(agree, 4),
        "epe_px": round(epe, 4) if epe is not None else None,
        "mpx_per_s": round(left.size / dt / 1e6, 2),
    }


def config2() -> dict:
    """StereoSGBM 1280x720 D=128 with subpixel + LR + speckle vs cv2."""
    import cv2
    import jax
    import jax.numpy as jnp
    from test_stereo_parity import synthetic_pair
    from stereo_vision_tpu.stereo import StereoSGBMParams, stereo_sgbm

    left, right, _ = synthetic_pair(h=720, w=1280, max_disp=128, seed=12)
    p = StereoSGBMParams(
        num_disparities=128,
        block_size=5,
        uniqueness_ratio=10,
        disp12_max_diff=1,
        speckle_window_size=100,
        speckle_range=2,
    )
    ref = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=128, blockSize=5, P1=p.P1, P2=p.P2,
        disp12MaxDiff=1, preFilterCap=p.prefilter_cap, uniquenessRatio=10,
        speckleWindowSize=100, speckleRange=2, mode=cv2.STEREO_SGBM_MODE_HH,
    ).compute(left, right)
    fn = jax.jit(lambda l, r: stereo_sgbm(l, r, p))
    mine, dt = _time_once(fn, jnp.asarray(left, jnp.int32), jnp.asarray(right, jnp.int32))
    agree, epe = _agreement(mine, ref)
    return {
        "config": "2_sgbm_1280x720_d128_full",
        "agreement": round(agree, 4),
        "epe_px": round(epe, 4) if epe is not None else None,
        "mpx_per_s": round(left.size / dt / 1e6, 2),
    }


def config3() -> dict:
    """Calibration -> rectification -> remap end-to-end on synthetic boards."""
    import cv2
    import jax
    import jax.numpy as jnp
    from test_calibration import render_board_views, K_TRUE, DIST_TRUE, SIZE
    from stereo_vision_tpu.calib import calibrate_camera, calibrate_stereo, checkerboard_object_points
    from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map
    from stereo_vision_tpu.ops.remap import remap_bilinear

    R_true, _ = cv2.Rodrigues(np.array([0.02, -0.3, 0.01]))
    T_true = np.array([-3400.0, 25.0, 80.0])
    obj, c1, _, c2 = render_board_views(n_frames=12, seed=13, stereo_RT=(R_true, T_true))
    t0 = time.perf_counter()
    cal = calibrate_stereo(obj, c1, c2, K_TRUE, DIST_TRUE, K_TRUE, DIST_TRUE, SIZE)
    solve_s = time.perf_counter() - t0
    R1, R2, P1, P2, Q = stereo_rectify(
        jnp.asarray(K_TRUE), jnp.asarray(np.r_[DIST_TRUE, np.zeros(3)]),
        jnp.asarray(K_TRUE), jnp.asarray(np.r_[DIST_TRUE, np.zeros(3)]),
        SIZE, jnp.asarray(cal.R), jnp.asarray(cal.T), alpha=0.0,
    )
    mx, my = init_undistort_rectify_map(
        jnp.asarray(K_TRUE), jnp.asarray(np.r_[DIST_TRUE, np.zeros(3)]), R1, P1, SIZE
    )
    img = np.random.default_rng(0).integers(0, 255, (SIZE[1], SIZE[0])).astype(np.float32)
    fn = jax.jit(remap_bilinear)
    _, dt = _time_once(fn, jnp.asarray(img), mx, my)
    baseline_err = abs(cal.baseline - np.linalg.norm(T_true)) / np.linalg.norm(T_true) * 100
    return {
        "config": "3_calibrate_rectify_remap",
        "stereo_rms_px": round(cal.rms, 4),
        "baseline_error_pct": round(float(baseline_err), 4),
        "calib_solve_s": round(solve_s, 2),
        "remap_mpx_per_s": round(img.size / dt / 1e6, 2),
    }


def config4() -> dict:
    """Batched detector forward + disparity->depth fusion (one jit graph)."""
    import jax
    import jax.numpy as jnp
    from stereo_vision_tpu.models import YOLOv8, decode_predictions
    from stereo_vision_tpu.stereo.depth import depth_from_disparity

    # BASELINE config #4 names YOLOv8m specifically (the in-repo trained
    # ball weights are the "n" variant; the timing config follows the spec).
    model = YOLOv8(num_classes=4, variant="m")
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)  # left+right in one batch
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # Bouguet Q for f=1000px, baseline 100mm, centered principal point:
    # Z = f*B/d = 1000*100/32 = 3125 mm at d=32.
    Qn = np.zeros((4, 4), np.float32)
    Qn[0, 0] = Qn[1, 1] = 1.0
    Qn[0, 3] = -128.0
    Qn[1, 3] = -128.0
    Qn[2, 3] = 1000.0
    Qn[3, 2] = 1.0 / 100.0
    Q = jnp.asarray(Qn)
    disp = jnp.full((256, 256), 32.0, jnp.float32)

    @jax.jit
    def fused(v, imgs, d):
        outs = model.apply(v, imgs, train=False)
        boxes, probs = decode_predictions(outs, (256, 256), 4)
        z = depth_from_disparity(d, Q)
        return boxes, probs, z

    out = fused(variables, x, disp)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fused(variables, x, disp)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    z = out[2]
    return {
        "config": "4_detector_depth_fusion",
        "forward_ms": round(dt * 1000, 2),
        "depth_at_32px_mm": float(np.asarray(z)[0, 0]),
    }


def config5() -> dict:
    """Batched stereo stream pipeline at NATIVE 1080p (remap+matcher+depth).

    Measures both matcher paths at the config's true resolution (the
    640x360 `fps_1080p_equiv` pixel-rate extrapolation from round 2 is
    gone): BM (D=64, block 15 — the production streaming config) and
    SGBM (D=128, 8-path). Steady-state = N chained iterations in ONE jit
    (a single re-dispatch under-counts through the remote tunnel and can
    hit its value cache); the carry reduces over the FULL depth output so
    no stage dead-codes, and touches a disparity pixel of the perturbed
    frame to keep iterations value-dependent.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from stereo_vision_tpu.parallel import create_mesh, make_sharded_pipeline
    from stereo_vision_tpu.parallel.mesh import DATA_AXIS
    from stereo_vision_tpu.parallel.streaming import batched_stereo_pipeline
    from stereo_vision_tpu.stereo.bm import StereoBMParams
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.ops.rectify import stereo_rectify, init_undistort_rectify_map
    from stereo_vision_tpu.utils.profiling import time_jitted

    n = len(jax.devices())
    Hh, Ww = 1080, 1920
    K = jnp.array(
        [[1600.0, 0, Ww / 2], [0, 1600.0, Hh / 2], [0, 0, 1.0]], jnp.float32
    )
    dist = jnp.zeros(8, jnp.float32)
    size = (Ww, Hh)
    R1, R2, P1, P2, Q = stereo_rectify(
        K, dist, K, dist, size, jnp.eye(3), jnp.array([-100.0, 0.0, 0.0]),
        alpha=0.0, horizontal_stereo=True,
    )
    maps = (
        *init_undistort_rectify_map(K, dist, R1, P1, size),
        *init_undistort_rectify_map(K, dist, R2, P2, size),
    )
    mesh = create_mesh(n, 1)
    run = make_sharded_pipeline(
        mesh, (maps[0], maps[1], maps[2], maps[3]), Q, matcher="bm",
        params=StereoBMParams(num_disparities=64, block_size=15),
    )
    rng = np.random.default_rng(0)
    l2 = rng.integers(0, 255, (max(n, 2), Hh, Ww)).astype(np.int32)
    disp, pts = run(l2, l2)  # compile + sharding-path smoke
    jax.block_until_ready(disp)

    batch_sh = NamedSharding(mesh, PS(DATA_AXIS))

    def reduce_out(out):
        disp2, pts2 = out
        z = jnp.where(jnp.isfinite(pts2[..., 2]), pts2[..., 2], 0.0)
        return (jnp.sum(z) * 1e-9 + disp2[0, 8, 8]).astype(jnp.float32)

    def measure(matcher, params, B):
        fn = functools.partial(
            batched_stereo_pipeline, maps=maps[:4], Q=Q, matcher=matcher,
            params=params,
        )
        lb = jax.device_put(
            jnp.asarray(
                rng.integers(0, 255, (B, Hh, Ww)).astype(np.int32)
            ),
            batch_sh,
        )
        dt = time_jitted(fn, (lb, lb), n=5, reduce_out=reduce_out)
        # Progress line per matcher: a failure in a LATER matcher must not
        # lose this one's number (1080p compiles take minutes each).
        print(
            f"# config5 {matcher}: {B * Hh * Ww / dt / 1e6:.1f} Mpx/s, "
            f"{B / dt:.2f} fps",
            file=sys.stderr, flush=True,
        )
        return B * Hh * Ww / dt / 1e6, B / dt

    bm_mpx, bm_fps = measure(
        "bm", StereoBMParams(num_disparities=64, block_size=15), max(n, 2)
    )
    # SGBM at 1080p: the D=128 volume is ~530 MB int16 per frame; batch 1
    # on a single chip (HBM), scales with the data axis on a real mesh.
    sgbm_mpx, sgbm_fps = measure(
        "sgbm",
        StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
        ),
        max(n, 1),
    )
    # Banded hierarchical SGBM (the bench.py headline mode, agreement-
    # gated there) at native 1080p: one lane-packed program per 32
    # frames (round-5 HIER4_FAST band 4 + two-level prior, selected by
    # B=32 in batched_stereo_pipeline). num_paths=3 matches bench.py's
    # hier4x3 headline (per-scene pins in tests/test_hier.py).
    hier_mpx, hier_fps = measure(
        "sgbm_hier",
        StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
            num_paths=3,
        ),
        32,
    )
    return {
        "config": "5_batched_streams_mesh_1080p",
        "devices": n,
        "bm_fps_1080p": round(bm_fps, 2),
        "bm_mpx_per_s": round(bm_mpx, 2),
        "sgbm_fps_1080p": round(sgbm_fps, 2),
        "sgbm_mpx_per_s": round(sgbm_mpx, 2),
        "sgbm_hier_fps_1080p": round(hier_fps, 2),
        "sgbm_hier_mpx_per_s": round(hier_mpx, 2),
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*", default=[1, 2, 3, 4, 5])
    ap.add_argument("--cpu", action="store_true", help="force CPU (virtual devices)")
    args = ap.parse_args()
    if args.cpu:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    for c in args.configs:
        try:
            print(json.dumps(CONFIGS[c]()), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"config": c, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
