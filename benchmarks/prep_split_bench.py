"""Fine split of the banded core's prep glue (0.95 ms/frame) on TPU.

  sobel  — vmap'd _xsobel_clipped on both images
  hleft  — + prep_left (BT half-extrema) on both left channels
  pright — + prep_right (129-lane replicate pad) on both right channels

ms per 720p frame, P=8 pack.
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
    from stereo_vision_tpu.stereo.sgbm import _xsobel_clipped
    from stereo_vision_tpu.stereo.banded_pallas import prep_left, prep_right

    P = 8
    left, right = _scene()
    lb = jnp.asarray(np.stack([left] * P))
    rb = jnp.asarray(np.stack([right] * P))
    ftz = 15

    def sobel(l, r):
        ls = jax.vmap(lambda im: _xsobel_clipped(im, ftz))(l)
        rs = jax.vmap(lambda im: _xsobel_clipped(im, ftz))(r)
        return ls, rs

    def hleft(l, r):
        ls, rs = sobel(l, r)
        lsv, lu0, lu1 = prep_left(ls)
        lrv, lv0, lv1 = prep_left(l.astype(jnp.int32))
        return lu0 + lu1 + lv0 + lv1 + lsv + lrv + rs

    def pright(l, r):
        ls, rs = sobel(l, r)
        lsv, lu0, lu1 = prep_left(ls)
        lrv, lv0, lv1 = prep_left(l.astype(jnp.int32))
        vs = prep_right(rs, D)
        vr = prep_right(r.astype(jnp.int32), D)
        return (
            (lu0 + lu1 + lv0 + lv1 + lsv + lrv).sum()
            + vs.sum() + vr.sum()
        )

    stages = {
        "sobel": lambda l, r: (sobel(l, r)[0] + sobel(l, r)[1]).astype(jnp.float32),
        "hleft": lambda l, r: hleft(l, r).astype(jnp.float32),
        "pright": lambda l, r: pright(l, r).astype(jnp.float32),
    }

    def timed(fn):
        @jax.jit
        def chained(l, r):
            def body(carry, i):
                li = l.at[:, 0, 0].set(carry + i)
                d = fn(li, r)
                return jnp.sum(jnp.ravel(d)[-1:]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(2 * N))
            return c
        _ = np.asarray(chained(lb, rb))
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb, rb))
        return (time.perf_counter() - t0) / (2 * N) / P * 1e3

    prev = 0.0
    for name, fn in stages.items():
        ms = timed(fn)
        print(f"{name:6s} {ms:7.3f} ms/frame  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
