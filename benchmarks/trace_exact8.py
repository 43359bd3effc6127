"""Trace exact8 (bench config, batch=4) — the verdict-r3 #8 stretch.

Reconciles the measured ~45 Mpx/s against the docs/sgbm_roofline.md
perfect-schedule floor (~61): the bucketed device-time rollup
(benchmarks/trace_report.py /tmp/exact8_trace 3) vs the chained wall
time says how much of the residual is inter-kernel scheduling bubbles
(wall - device busy) vs in-kernel time above the instruction-count
estimate. Run alone on an idle chip.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, D
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm

    left, right = _scene()
    B = 4
    lb = jnp.asarray(np.stack([left] * B))
    rb = jnp.asarray(np.stack([right] * B))
    p = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=100, speckle_range=2,
    )
    fn = jax.jit(lambda l, r: jax.vmap(lambda a, b: stereo_sgbm(a, b, p))(l, r))
    np.asarray(fn(lb, rb))  # compile + warm

    # Wall reference: N chained (the bench method — amortizes the tunnel).
    N = 25

    @jax.jit
    def chained(l, r):
        def body(carry, i):
            li = l.at[:, 0, 0].set(carry + i)
            d = fn(li, r)
            return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
        return c

    _ = np.asarray(chained(lb, rb))
    t0 = time.perf_counter()
    _ = np.asarray(chained(lb, rb))
    wall = (time.perf_counter() - t0) / N / B * 1000
    print(f"chained wall: {wall:.2f} ms/frame ({H * W / wall / 1e3:.1f} Mpx/s)", flush=True)

    with jax.profiler.trace("/tmp/exact8_trace"):
        for i in range(3):
            out = fn(lb.at[:, 0, 0].set(i), rb)
        np.asarray(out)
    print("trace written to /tmp/exact8_trace — run:", flush=True)
    print("  python benchmarks/trace_report.py /tmp/exact8_trace 3", flush=True)


if __name__ == "__main__":
    main()
