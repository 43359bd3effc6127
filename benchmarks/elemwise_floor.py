"""Calibration: cost of trivial passes over a (8, 720, 1280) int32 pack.

  add1     — x + 1 (one fused elementwise pass)
  shift2   — lane shift left+right pair + add (the sobel access pattern)
  vshift2  — sublane (row) shift pair + add
  cast     — int32 -> f32 -> int32 round trip
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _scene, N

    P = 8
    left, _ = _scene()
    lb = jnp.asarray(np.stack([left] * P))

    def add1(x):
        return x + 1

    def shift2(x):
        l = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
        r = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
        return r - l + x

    def vshift2(x):
        u = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        d = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        return u - d + x

    def cast(x):
        return (x.astype(jnp.float32) * 0.5).astype(jnp.int32)

    cands = {"add1": add1, "shift2": shift2, "vshift2": vshift2, "cast": cast}

    def timed(fn):
        @jax.jit
        def chained(a):
            def body(carry, i):
                ai = a.at[:, 0, 0].set(carry + i)
                d = fn(ai)
                return jnp.sum(d[:, -1, -2]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(8 * N))
            return c
        _ = np.asarray(chained(lb))
        t0 = time.perf_counter()
        _ = np.asarray(chained(lb))
        return (time.perf_counter() - t0) / (8 * N) / P * 1e3

    for name, fn in cands.items():
        ms = timed(fn)
        print(f"{name:8s} {ms:7.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
