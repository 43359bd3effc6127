"""A/B timing: hierarchical SGBM vs full-D on the real TPU (720p).

Also probes whether banded (D=32) Pallas kernels scale with D on this
Mosaic target (lane-padding question: a (W, 32) block could be padded to
128 lanes, erasing the band savings).

Writes progress lines to stdout; run redirected to a file per CLAUDE.md.
"""

from __future__ import annotations

import time

import numpy as np


def scene_720p(seed=0):
    """Textured ramp+box scene at 720p with disparities up to ~90 (needs
    D=128), built without cv2 (pure numpy bilinear remap)."""
    rng = np.random.default_rng(seed)
    H, W, pad = 720, 1280, 160
    base = rng.uniform(0, 255, (H, W + pad)).astype(np.float32)
    # cheap smoothing: two box passes
    for _ in range(2):
        base = (
            base
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
            + np.roll(base, 1, 0) + np.roll(base, -1, 0)
        ) / 5.0
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    disp = 20.0 + 40.0 * xx / W + 20.0 * yy / H
    disp[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = 90.0
    xs = xx + pad - disp
    x0 = np.floor(xs).astype(np.int64)
    f = xs - x0
    x0 = np.clip(x0, 0, W + pad - 2)
    left = base[yy.astype(np.int64), x0] * (1 - f) + base[yy.astype(np.int64), x0 + 1] * f
    right = base[:, pad : pad + W]
    noise = rng.normal(0, 1.5, (H, W))
    left = np.clip(left + noise, 0, 255).astype(np.uint8)
    right = np.clip(right + rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.uint8)
    return left, right, disp


def main():
    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
    from stereo_vision_tpu.stereo.hier import HierParams, stereo_sgbm_hier
    from stereo_vision_tpu.utils.profiling import time_jitted

    print("devices:", jax.devices(), flush=True)
    left, right, gt = scene_720p()
    l = jnp.asarray(left.astype(np.int32))
    r = jnp.asarray(right.astype(np.int32))
    H, W = left.shape

    base = dict(
        num_disparities=128, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
    )

    from stereo_vision_tpu.stereo.hier import stereo_sgbm_hier_batch

    P = 4
    l4 = jnp.stack([l] * P)
    r4 = jnp.stack([r] * P)

    configs = [
        ("hierpack8", lambda a, b: stereo_sgbm_hier_batch(a, b, StereoSGBMParams(**base), HierParams())),
        ("hierpack4", lambda a, b: stereo_sgbm_hier_batch(a, b, StereoSGBMParams(num_paths=4, **base), HierParams())),
        ("full8", lambda a, b: stereo_sgbm(a, b, StereoSGBMParams(**base))),
        ("full4", lambda a, b: stereo_sgbm(a, b, StereoSGBMParams(num_paths=4, **base))),
    ]
    outs = {}
    for name, fn in configs:
        batched = name.startswith("hierpack")
        args = (l4, r4) if batched else (l, r)
        t0 = time.time()
        out = np.asarray(jax.jit(fn)(*args))
        outs[name] = out[0] if batched else out
        print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
        dt = time_jitted(fn, args, n=5)
        frames = P if batched else 1
        dt_f = dt / frames
        print(f"{name}: {dt_f*1e3:.2f} ms/frame  {H*W/dt_f/1e6:.1f} Mpx/s", flush=True)

    # agreement of each mode vs our exact full8 (cv2-free proxy here;
    # true cv2 agreement is asserted in tests/test_hier.py on CPU)
    ref = outs["full8"]
    for name, out in outs.items():
        rv = ref > -1
        mv = out > -1
        both = rv & mv
        agree = ((~rv & ~mv) | (both & (np.abs(out - ref) <= 1.0))).mean()
        valid = mv
        err = np.abs(out[valid] - gt[valid])
        print(f"{name}: vs-full8 agree={agree:.4f}  gt-median-err={np.median(err):.3f}", flush=True)


if __name__ == "__main__":
    main()
