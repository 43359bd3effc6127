"""Sub-split of hier16's coarse+shift stage (1.81 ms/frame) on the TPU.

Rows time progressively larger prefixes (chained-jit, ms per FULL-RES
frame, P=8 pack):

  down      — vmap'd box downsample of the pack (both images)
  cstats    — + two 4-frame banded_stats_pack calls at 180x320, Dc=32
  cassm     — + coarse assemble (subpixel/uniqueness/LR at Dc=32)
  fill      — + _fill_invalid (12 fori rounds) + pools + tile min/max
  shift     — + quantize/clip + repeat-upsample (the full shift stage)

Run alone; redirect output to a file.
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
    from stereo_vision_tpu.stereo.banded_pallas import banded_stats_pack

    hp = hier.HIER_FAST
    P = 128 // hp.band
    p4 = StereoSGBMParams(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_window_size=0, num_paths=4,
    )
    left, right = _scene()
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    f = hp.coarse_factor
    cp = hier._coarse_params(p4, D, f, hp)
    Dc = D // f
    pack_c = 128 // Dc

    def down(l, r):
        lc = jax.vmap(lambda a: hier._downsample_box(a, f))(l)
        rc = jax.vmap(lambda a: hier._downsample_box(a, f))(r)
        return lc, rc

    def cstats(l, r):
        lc, rc = down(l, r)
        Hc, Wc = lc.shape[1:]
        s0 = jnp.zeros((pack_c, Hc, Wc), jnp.int32)
        outs = []
        for i in range(0, P, pack_c):
            st = banded_stats_pack(
                lc[i:i + pack_c], rc[i:i + pack_c], s0, cp, Dc,
                hp.granularity, min_x=Dc,
            )
            outs.append(st[0] + st[1])
        return sum(o.sum() for o in outs)

    def cassm(l, r):
        lc, rc = down(l, r)
        Hc, Wc = lc.shape[1:]
        s0 = jnp.zeros((pack_c, Hc, Wc), jnp.int32)
        return jnp.concatenate([
            hier._assemble_disparity_pack(
                list(banded_stats_pack(
                    lc[i:i + pack_c], rc[i:i + pack_c], s0, cp, Dc,
                    hp.granularity, min_x=Dc,
                )),
                None, Wc, Dc, Dc, Dc, cp, "scan",
            )
            for i in range(0, P, pack_c)
        ])

    def fill(l, r):
        disp_c = cassm(l, r)

        def one(d):
            prior = hier._fill_invalid(d, 0.0) * f
            lo = hier._pool(prior, hp.local_window, jnp.minimum) - hp.margin
            hi = hier._pool(prior, hp.local_window, jnp.maximum) + hp.margin
            Hc, Wc = prior.shape
            t = hp.tile
            Ht, Wt = Hc // t, Wc // t
            lo_t = lo[: Ht * t, : Wt * t].reshape(Ht, t, Wt, t).min(axis=(1, 3))
            hi_t = hi[: Ht * t, : Wt * t].reshape(Ht, t, Wt, t).max(axis=(1, 3))
            return lo_t + hi_t

        return jax.vmap(one)(disp_c)

    def shift(l, r):
        disp_c = cassm(l, r)
        s = jax.vmap(lambda d: hier.shift_map(d, D, hp))(disp_c)
        return s.astype(jnp.float32)

    stages = {
        "down": lambda l, r: down(l, r)[0].astype(jnp.float32),
        "cstats": cstats,
        "cassm": cassm,
        "fill": fill,
        "shift": shift,
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
        print(f"{name:7s} {ms:7.3f} ms/frame  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
