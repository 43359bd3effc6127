"""A/B: xsobel formulations on (P, H, W) on TPU (0.52 ms/frame today).

  cur    — vmap'd _xsobel_clipped (6 lane concats + 2 .at column sets)
  lin    — dx is linear: t = up + 2*img + down (sublane shifts), then
           ONE left/right lane-shift pair of t; borders via iota select
  roll   — same but lane shifts via jnp.roll (wrapped columns land only
           on the border columns, which the iota select overwrites)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, H, W, N
    from stereo_vision_tpu.stereo.sgbm import _xsobel_clipped

    P, ftz = 8, 15
    left, right = _scene()
    lb = jnp.asarray(np.stack([left] * P))

    def cur(x):
        return jax.vmap(lambda im: _xsobel_clipped(im, ftz))(x)

    def _vert3(img):
        up = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
        dn = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        return up + 2 * img + dn

    def lin(x):
        img = x.astype(jnp.int32)
        t = _vert3(img)
        l = jnp.concatenate([t[:, :, :1], t[:, :, :-1]], axis=2)
        r = jnp.concatenate([t[:, :, 1:], t[:, :, -1:]], axis=2)
        v = jnp.clip(r - l, -ftz, ftz) + ftz
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        return jnp.where((lane == 0) | (lane == W - 1), ftz, v)

    def roll(x):
        img = x.astype(jnp.int32)
        t = _vert3(img)
        d = jnp.roll(t, -1, axis=2) - jnp.roll(t, 1, axis=2)
        v = jnp.clip(d, -ftz, ftz) + ftz
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        return jnp.where((lane == 0) | (lane == W - 1), ftz, v)

    ref = np.asarray(jax.jit(cur)(lb))
    cands = {"cur": cur, "lin": lin, "roll": roll}

    def timed(fn):
        @jax.jit
        def chained(a):
            def body(carry, i):
                ai = a.at[:, 0, 0].set(carry + i)
                d = fn(ai)
                return jnp.sum(d[:, -1, -2]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(4 * N))
            return c
        _ = np.asarray(chained(lb))
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb))
        return (time.perf_counter() - t0) / (4 * N) / P * 1e3

    for name, fn in cands.items():
        out = np.asarray(jax.jit(fn)(lb))
        exact = bool((out == ref).all())
        ms = timed(fn)
        print(f"{name:5s} {ms:7.4f} ms/frame  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
