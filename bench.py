"""Headline benchmark: SGBM disparity throughput (Mpx/s/chip, D=128).

Per /root/repo/BASELINE.json config #2: StereoSGBM on a 1280x720 pair,
D=128 with subpixel + uniqueness + LR check + SPECKLE FILTER (window 100,
range 2), target >= 500 Mpx/s/chip. The BASELINE contract is >= 98%
within-1px agreement / <= 1 px EPE vs cv2 MODE_HH — NOT bit-exactness —
so the headline is the fastest mode that PASSES an in-bench agreement
gate vs the bit-exact 8-path reference on a structured scene (disparity
ramps + a 90 px foreground box, not a constant shift). The gate result
is printed alongside the number so it is self-certifying; the bit-exact
mode's own throughput is reported in the same line for reference.

Candidate modes (all full StereoSGBMParams semantics incl. speckle):
  exact8   — 8-path MODE_HH parity (bit-exact vs cv2; tests pin this)
  fast4    — 4-path (vertical + horizontal only) full-D search
  hier4    — coarse-to-fine banded search (stereo/hier.py), 4-path,
             band 32 (4 frames per 128-lane pack)
  hier16   — band-16 preset (HIER_FAST): 8 frames per pack, half the
             per-frame core work; agreement pinned in tests/test_hier.py
  hier16x3 — hier16 with a 3-path full-res refinement (vertical pair +
             L->R; the banded prior carries the global structure, so
             dropping R->L costs ~0.2% agreement for ~+7% speed —
             benchmarks/paths2_agreement*.py + hier_ab_r3i.py; 2-path
             measured BELOW the 0.98 bar on the big-jump scene and is
             not a candidate)
  hier8x3  — round-4 two-level preset (HIER8_FAST): a 1/2-res band-8
             2-path mid pass tightens the prior for an 8-lane full-res
             band — 16 frames per 128-lane pack, one 16-frame mid pack
             (benchmarks/hier_ab_r4a/b/d/e)
  hier4x3  — round-5 band-4 preset (HIER4_FAST): the same two-level
             prior feeding a 4-lane full-res band at G=2 — 32 frames
             per pack (benchmarks/hier_ab_r5a*; G=1 pins better but
             the pix s-select loop is pack-constant at (D-K)/G iters,
             so G=2 is the measured optimum). NOTE: "hier4" above is
             the band-32 4-PATH legacy mode; "hier4x3" is band 4.

The agreement gate takes the MINIMUM across three 720p scenes (ramp+box,
true-occlusion composite, 110 px near-D-limit jump) so a mode cannot
overfit one scene; per-scene values are reported in the JSON.

Timing method: N chained runs inside one jit dispatch (each iteration's
input depends on the previous output), materialized at the end — immune
to async-dispatch undercounting and value-keyed result caching in the
remote-TPU tunnel. N=100: the tunnel adds a FIXED ~26-34 ms round-trip
per dispatch (measured by N-sweeps, r3p/r3q: 35.7/32.4/30.4 ms-per-iter
at N=5/10/25 vs 29.3 ms device-module time in the xplane trace; the
headline mode measures 242.2/248.2/250.4 Mpx/s at N=25/50/100, a
t_dev + F/N fit with F~34 ms and asymptote ~253), so small N
under-reports steady-state throughput by the amortized dispatch cost;
N=100 captures ~99% of the asymptote at ~3 s per timed call.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPXS = 500.0
H, W, D = 720, 1280, 128
N = 100
# Frames per dispatch, per mode: the lane-packed hier kernels process
# 128/band frames at full vector width (4 at band 32, 8 at band 16); the
# full-D modes measured +18% at batch=4 over batch=1 (metric is per-chip
# throughput; per-frame latency is batch=1, benchmarks/kernel_bench.py).
AGREE_GATE = 0.98  # BASELINE.json north_star: >= 98% within 1 px


def _scene(seed=0, box_disp=90.0):
    """Textured scene with disparity ramps (20..80) + a ``box_disp`` px
    foreground box — exercises the full D range and real discontinuities."""
    rng = np.random.default_rng(seed)
    pad = 160
    base = rng.uniform(0, 255, (H, W + pad)).astype(np.float32)
    for _ in range(2):
        base = (
            base
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
            + np.roll(base, 1, 0) + np.roll(base, -1, 0)
        ) / 5.0
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    disp = 20.0 + 40.0 * xx / W + 20.0 * yy / H
    disp[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = box_disp
    xs = xx + pad - disp
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W + pad - 2)
    f = xs - x0
    yi = yy.astype(np.int64)
    left = base[yi, x0] * (1 - f) + base[yi, x0 + 1] * f
    right = base[:, pad : pad + W]
    left = np.clip(left + rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.int32)
    right = np.clip(right + rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.int32)
    return left, right


def _scene_occ(seed=2):
    """True-occlusion scene at 720p: a fronto-parallel foreground square
    (d=85) COMPOSITED over a background ramp — background pixels near the
    box's right edge are visible in one view only, exercising the
    LR-invalidation and band-placement behavior the ramp scene cannot.
    (The r3 verdict's weak #4: a single-scene gate can be overfit.)"""
    rng = np.random.default_rng(seed)
    pad = 160

    def tex(shape):
        t = rng.uniform(0, 255, shape).astype(np.float32)
        for _ in range(2):
            t = (
                t + np.roll(t, 1, 1) + np.roll(t, -1, 1)
                + np.roll(t, 1, 0) + np.roll(t, -1, 0)
            ) / 5.0
        return (t - t.min()) / (np.ptp(t) + 1e-9) * 255.0

    base = tex((H, W + pad))
    fg = tex((H, W))  # foreground texture in RIGHT coordinates
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    disp_bg = 15.0 + 25.0 * xx / W + 10.0 * yy / H
    xs = xx + pad - disp_bg
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W + pad - 2)
    f = xs - x0
    yi = yy.astype(np.int64)
    left = base[yi, x0] * (1 - f) + base[yi, x0 + 1] * f
    right = base[:, pad : pad + W].copy()

    df = 85  # integer: the composite shift is exact
    box_r = (
        (yy >= H // 4) & (yy < H // 2) & (xx >= W // 2) & (xx < 3 * W // 4)
    )
    right[box_r] = fg[box_r]
    xl = np.clip(xx.astype(np.int64) - df, 0, W - 1)
    box_l = box_r[yi, xl] & (xx.astype(np.int64) - df >= 0)
    left[box_l] = fg[yi, xl][box_l]
    left = np.clip(left + rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.int32)
    right = np.clip(right + rng.normal(0, 1.5, (H, W)), 0, 255).astype(np.int32)
    return left, right


def _agreement(out, ref):
    rv = ref > -1
    mv = out > -1
    both = rv & mv
    return float(((~rv & ~mv) | (both & (np.abs(out - ref) <= 1.0))).mean())


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
    from stereo_vision_tpu.stereo.hier import (
        HIER_FAST,
        HIER4_FAST,
        HIER8_FAST,
        HierParams,
        stereo_sgbm_hier_batch,
    )

    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10, disp12_max_diff=1,
        speckle_window_size=100, speckle_range=2,
    )
    p8 = StereoSGBMParams(**base)
    p4 = StereoSGBMParams(num_paths=4, **base)
    p3 = StereoSGBMParams(num_paths=3, **base)

    left, right = _scene()
    # Multi-scene agreement gate (r3 verdict weak #4: one scene can be
    # overfit): timing runs on the ramp+box scene; the gate takes the
    # MINIMUM agreement across it, a true-occlusion composite, and a
    # 110 px near-D-limit jump.
    gate_scenes = {
        "rampbox": (left, right),
        "occl": _scene_occ(),
        "jump110": _scene(seed=3, box_disp=110.0),
    }

    modes = {  # name -> (fn, frames per dispatch)
        "exact8": (lambda l, r: jax.vmap(lambda a, b: stereo_sgbm(a, b, p8))(l, r), 4),
        "fast4": (lambda l, r: jax.vmap(lambda a, b: stereo_sgbm(a, b, p4))(l, r), 4),
        "hier4": (lambda l, r: stereo_sgbm_hier_batch(l, r, p4, HierParams()), 4),
        "hier16": (lambda l, r: stereo_sgbm_hier_batch(l, r, p4, HIER_FAST), 8),
        "hier16x3": (lambda l, r: stereo_sgbm_hier_batch(l, r, p3, HIER_FAST), 8),
        "hier8x3": (lambda l, r: stereo_sgbm_hier_batch(l, r, p3, HIER8_FAST), 16),
        "hier4x3": (lambda l, r: stereo_sgbm_hier_batch(l, r, p3, HIER4_FAST), 32),
    }

    def batch(B, scene=None):
        sl, sr = scene if scene is not None else (left, right)
        return (
            jnp.asarray(np.stack([sl] * B)),
            jnp.asarray(np.stack([sr] * B)),
        )

    def timed(fn, B):
        lb, rb = batch(B)

        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)  # every frame perturbed
                d = fn(li, r)
                return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()

            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c

        _ = np.asarray(chained(lb, rb))  # compile + first run
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb, rb))
        dt = (time.perf_counter() - t0) / N
        return B * H * W / dt / 1e6

    results = {}
    outs = {}  # mode -> scene -> first-frame output
    for name, (fn, B) in modes.items():
        jfn = jax.jit(fn)
        outs[name] = {
            sc: np.asarray(jfn(*batch(B, scene=pair)))[0]
            for sc, pair in gate_scenes.items()
        }
        results[name] = timed(fn, B)
        print(f"# {name}: {results[name]:.1f} Mpx/s", file=sys.stderr, flush=True)

    agree_scene = {
        name: {
            sc: _agreement(outs[name][sc], outs["exact8"][sc])
            for sc in gate_scenes
        }
        for name in modes
    }
    agree = {name: min(agree_scene[name].values()) for name in modes}
    compliant = [n for n in modes if agree[n] >= AGREE_GATE]
    # exact8 is the agreement reference, so it self-agrees at 1.0 and
    # compliant can never be empty — assert that invariant explicitly so
    # a future gate/reference change fails with a diagnostic instead of
    # an opaque max() ValueError (r4 advice).
    assert "exact8" in compliant, (
        "agreement gate excluded the reference mode itself — the gate or "
        f"reference changed incompatibly: {agree}"
    )
    headline = max(compliant, key=lambda n: results[n])

    mpx = results[headline]
    print(
        json.dumps(
            {
                "metric": "sgbm_disparity_throughput_d128_720p",
                "value": round(mpx, 2),
                "unit": "Mpx/s/chip",
                "vs_baseline": round(mpx / BASELINE_MPXS, 4),
                "mode": headline,
                "agreement_within1px_vs_exact": round(agree[headline], 4),
                "agreement_gate": AGREE_GATE,
                "agreement_per_scene": {
                    sc: round(v, 4) for sc, v in agree_scene[headline].items()
                },
                "exact8_mpx_per_s": round(results["exact8"], 2),
                "all_modes": {
                    n: {
                        "mpx_per_s": round(results[n], 2),
                        "agreement": round(agree[n], 4),
                        "per_scene": {
                            sc: round(v, 4) for sc, v in agree_scene[n].items()
                        },
                    }
                    for n in modes
                },
            }
        )
    )


if __name__ == "__main__":
    main()
