"""Round-5 stretch (verdict-r4 #8): one D=256 data point.

The mid-level machinery exists for deeper disparity ranges
(stereo/hier.py mid_levels); this gives it a measured row: CPU
agreement pins vs cv2 MODE_HH at D=256 on deep-disparity scenes, for
the HIER4_FAST and HIER8_FAST presets applied unchanged (their
two-level prior: 1/4 coarse Dc=64 full-range -> 1/2-res band-8 mid
Dm=128 -> band-4/8 full res).

Usage: python benchmarks/hier_d256.py [cpu|chip]
  cpu  — agreement pins (240x768 scenes, ramp to 200 px + 200 px jump)
  chip — 720p D=256 throughput, chained-jit (run alone on idle chip)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")


def _deep_scene(h, w, seed=0, jump=None, lo=40.0, hi=200.0):
    """Textured ramp scene with disparities in [lo, hi] (+ optional
    fronto-parallel box at ``jump``), exercising the D=256 range."""
    rng = np.random.default_rng(seed)
    pad = 280
    base = rng.uniform(0, 255, (h, w + pad)).astype(np.float32)
    for _ in range(2):
        base = (
            base + np.roll(base, 1, 1) + np.roll(base, -1, 1)
            + np.roll(base, 1, 0) + np.roll(base, -1, 0)
        ) / 5.0
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = lo + (hi - lo) * xx / w + 10.0 * yy / h
    if jump is not None:
        disp[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = jump
    xs = xx + pad - disp
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w + pad - 2)
    f = xs - x0
    yi = yy.astype(np.int64)
    left = base[yi, x0] * (1 - f) + base[yi, x0 + 1] * f
    right = base[:, pad : pad + w]
    left = np.clip(left + rng.normal(0, 1.5, (h, w)), 0, 255).astype(np.int32)
    right = np.clip(right + rng.normal(0, 1.5, (h, w)), 0, 255).astype(np.int32)
    return left, right


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo.hier import (
        HIER4_FAST,
        HIER8_FAST,
        stereo_sgbm_hier,
        stereo_sgbm_hier_batch,
    )

    D = 256
    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
    )
    p3 = StereoSGBMParams(num_paths=3, **base)

    if mode == "cpu":
        from tests.test_stereo_parity import agreement
        from tests.test_hier import _cv_full

        scenes = {
            "deepramp": _deep_scene(240, 768, seed=1),
            "jump200": _deep_scene(240, 768, seed=2, jump=200.0, lo=30.0, hi=120.0),
            "jump230": _deep_scene(240, 768, seed=4, jump=230.0, lo=30.0, hi=120.0),
        }
        p8 = StereoSGBMParams(**base)
        refs = {
            n: _cv_full(p8, l.astype(np.uint8), r.astype(np.uint8))
            for n, (l, r) in scenes.items()
        }
        for pname, hp in (("hier8x3", HIER8_FAST), ("hier4x3", HIER4_FAST)):
            line = []
            for n, (l, r) in scenes.items():
                mine = np.asarray(
                    stereo_sgbm_hier(jnp.asarray(l), jnp.asarray(r), p3, hp)
                )
                agree, epe, _ = agreement(mine, refs[n])
                line.append(f"{n}={agree:.4f}/{epe:.3f}")
            print(f"D=256 {pname:8s} {' '.join(line)}", flush=True)
        return

    # chip throughput: 720p D=256
    import time

    H, W = 720, 1280
    left, right = _deep_scene(H, W, seed=1)
    N = 50
    for pname, hp in (("hier8x3", HIER8_FAST), ("hier4x3", HIER4_FAST)):
        P = 128 // hp.band
        lb = jnp.asarray(np.stack([left] * P))
        rb = jnp.asarray(np.stack([right] * P))

        @jax.jit
        def chained(l, r, hp=hp):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                d = stereo_sgbm_hier_batch(li, r, p3, hp)
                return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()

            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c

        t0 = time.time()
        _ = np.asarray(chained(lb, rb))
        print(f"# {pname} compile+first {time.time()-t0:.1f}s", flush=True)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chained(lb, rb))
            dt = (time.perf_counter() - t0) / N
            reps.append(P * H * W / dt / 1e6)
        print(
            f"D=256 720p {pname}: {' '.join(f'{r:.1f}' for r in reps)} Mpx/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
