"""Stage split of the hier16 headline mode on the real TPU.

Times (chained-jit, bench.py method) progressively larger prefixes of
``stereo_sgbm_hier_batch`` with the HIER_FAST preset so each stage's cost
is the delta between consecutive rows:

  coarse    — downsample + packed coarse SGBM + coarse assemble
  shift     — + shift-map build
  stats     — + full-res banded packed core (cost/box/scans/WTA)
  assemble  — + subpixel/LR/update-slice per frame (full hier, speckle=0)
  full      — + per-frame speckle (the bench.py headline config)

Run AFTER any pytest finishes (CLAUDE.md: concurrent CPU load corrupts
TPU timing). Output to a file, not a pipe.
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
        banded_stats_pack,
        downsample_box_pack,
    )

    hp = hier.HIER_FAST
    P = 128 // hp.band
    base = dict(
        num_disparities=D, block_size=5, uniqueness_ratio=10,
        disp12_max_diff=1, speckle_range=2, num_paths=4,
    )
    p_spk = StereoSGBMParams(speckle_window_size=100, **base)
    p_nospk = StereoSGBMParams(speckle_window_size=0, **base)

    left, right = _scene()
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))

    f = hp.coarse_factor
    cp = hier._coarse_params(p_nospk, D, f, hp)
    Dc = D // f
    pack_c = 128 // Dc

    def coarse_prior(l, r):
        # Mirrors the production defaults (r3f/r3g): fused Pallas box
        # downsample + the Pallas LR backend at the coarse assemble.
        lc = downsample_box_pack(l, f)
        rc = downsample_box_pack(r, f)
        Hc, Wc = lc.shape[1:]
        s0 = jnp.zeros((pack_c, Hc, Wc), jnp.int32)
        return jnp.concatenate([
            hier._assemble_disparity_pack(
                list(banded_stats_pack(
                    lc[i:i + pack_c], rc[i:i + pack_c], s0, cp, Dc,
                    hp.granularity, min_x=Dc,
                )),
                None, Wc, Dc, Dc, Dc, cp, "pallas",
            )
            for i in range(0, P, pack_c)
        ])

    def with_shift(l, r):
        disp_c = coarse_prior(l, r)
        s = jax.vmap(lambda d: hier.shift_map(d, D, hp))(disp_c)
        if s.shape[1:] != (H, W):
            s = jnp.pad(s, ((0, 0), (0, H - s.shape[1]), (0, W - s.shape[2])),
                        mode="edge")
        return s

    def with_stats(l, r):
        s = with_shift(l, r)
        stats = banded_stats_pack(l, r, s, p_nospk, hp.band, hp.granularity, min_x=D)
        return stats[0] + stats[1]  # touch outputs

    stages = {
        "coarse": lambda l, r: coarse_prior(l, r),
        "shift": lambda l, r: with_shift(l, r).astype(jnp.float32),
        "stats": lambda l, r: with_stats(l, r).astype(jnp.float32),
        "assemble": lambda l, r: hier.stereo_sgbm_hier_batch(l, r, p_nospk, hp),
        "full": lambda l, r: hier.stereo_sgbm_hier_batch(l, r, p_spk, hp),
    }

    def timed(fn):
        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                d = fn(li, r)
                return jnp.sum(d[..., -1, -1]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c
        _ = np.asarray(chained(lb, rb))
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb, rb))
        return (time.perf_counter() - t0) / N / P * 1e3  # ms/frame

    prev = 0.0
    for name, fn in stages.items():
        ms = timed(fn)
        print(f"{name:9s} {ms:7.3f} ms/frame  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
