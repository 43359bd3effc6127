"""Sub-split of the full-res banded core (2.93 ms/frame at hier16) on TPU.

  prep   — xsobel + prep_left/prep_right packing
  pix    — + banded pixel-cost kernel
  box    — + aligned box-window kernel
  stats  — + scans + WTA (banded_reduce_pack) [= full core]

ms per 720p frame, P=8 pack. Run alone; redirect output to a file.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, D, N
    from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
    from stereo_vision_tpu.stereo import hier
    from stereo_vision_tpu.stereo.banded_pallas import (
        banded_pixel_cost_pack,
        aligned_box_packed,
        banded_reduce_pack,
    )

    hp = hier.HIER_FAST
    P, B, G = 128 // hp.band, hp.band, hp.granularity
    p4 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=0, num_paths=4,
    )
    left, right = _scene()
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))
    rng = np.random.default_rng(0)
    sb = jnp.asarray(
        (rng.integers(0, (D - B) // G + 1, (P, H, W)) * G).astype(np.int32)
    )

    ftz = p4.ftzero

    def pix(l, r):
        s_ext = jnp.pad(sb, ((0, 0), (0, 0), (1, 1)), mode="edge")
        return banded_pixel_cost_pack(
            l.astype(jnp.int32), r.astype(jnp.int32), s_ext,
            ndisp=D, band=B, granularity=G, ftzero=ftz,
        )

    def box(l, r):
        return aligned_box_packed(pix(l, r), sb, B, G, p4.block_size)

    def stats(l, r):
        C = box(l, r)
        Cv = C[:, D:, :]
        sv = sb[:, :, D:]
        minS, best, sm, s0, sp, uok = banded_reduce_pack(
            Cv, sv, B, G, p4.P1, p4.P2, p4.uniqueness_ratio,
            num_paths=p4.num_paths,
        )
        return minS + best

    stages = {
        "pix": lambda l, r: pix(l, r).astype(jnp.float32),
        "box": lambda l, r: box(l, r).astype(jnp.float32),
        "stats": lambda l, r: stats(l, r).astype(jnp.float32),
    }

    def timed(fn):
        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                d = fn(li, r)
                return jnp.sum(jnp.ravel(d)[-1:]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c
        _ = np.asarray(chained(lb, rb))
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb, rb))
        return (time.perf_counter() - t0) / N / P * 1e3

    prev = 0.0
    for name, fn in stages.items():
        ms = timed(fn)
        print(f"{name:6s} {ms:7.3f} ms/frame  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
