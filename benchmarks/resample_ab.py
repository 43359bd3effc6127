"""A/B: 4x4 box-downsample and 4x repeat-upsample formulations on TPU.

The hier coarse stage spends 1.24 ms/frame in the reshape-mean
downsample and ~0.3 ms in the repeat upsample (coarse_split_bench) —
both are lane-dimension relayouts, not compute. Candidates:

  down/reshape   — x.reshape(Hc, f, Wc, f).mean((1, 3))  (current)
  down/rwin      — lax.reduce_window add, window=stride=(f, f)
  down/mxu       — 0/1 pooling matmuls on both axes (f32 accum is exact
                   for integer images <= 255)
  down/slice     — sum of f*f strided slices
  up/repeat      — jnp.repeat on both axes (current)
  up/mxu         — 0/1 expansion matmuls
  up/bcast       — broadcast_to + reshape

Each is timed standalone over the P=8 pack (ms per 720p frame).
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

    P, f = 8, 4
    Hc, Wc = H // f, W // f
    left, _ = _scene()
    xb = jnp.asarray(np.stack([left] * P))            # (P, 720, 1280) int32
    sb = jnp.asarray(
        np.random.default_rng(0).integers(0, 112, (P, Hc, Wc), dtype=np.int32)
    )

    def down_reshape(x):
        v = x.astype(jnp.float32).reshape(P, Hc, f, Wc, f).mean(axis=(2, 4))
        return jnp.round(v).astype(jnp.int32)

    def down_rwin(x):
        s = jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add,
            (1, f, f), (1, f, f), "VALID",
        )
        return jnp.round(s / (f * f)).astype(jnp.int32)

    def _pool_mat(n, nc):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, nc), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, nc), 1)
        return (r // f == c).astype(jnp.float32)

    def down_mxu(x):
        A = _pool_mat(H, Hc)   # (H, Hc)
        B = _pool_mat(W, Wc)   # (W, Wc)
        v = x.astype(jnp.float32)
        # (P, H, W) x (H, Hc) -> (P, W, Hc): ints <= 255, f32 accum exact.
        t = jax.lax.dot_general(v, A, (((1,), (0,)), ((), ())))
        # sums <= 1020 exceed bf16's 8-bit mantissa: contract in HIGHEST.
        u = jax.lax.dot_general(
            t.transpose(0, 2, 1), B, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.round(u / (f * f)).astype(jnp.int32)

    def down_slice(x):
        v = x.astype(jnp.float32)
        s = sum(
            v[:, dy::f, dx::f] for dy in range(f) for dx in range(f)
        )
        return jnp.round(s / (f * f)).astype(jnp.int32)

    def up_repeat(s):
        return jnp.repeat(jnp.repeat(s, f, axis=1), f, axis=2)

    def _exp_mat(nc, n):
        r = jax.lax.broadcasted_iota(jnp.int32, (nc, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (nc, n), 1)
        return (c // f == r).astype(jnp.float32)

    def up_mxu(s):
        A = _exp_mat(Hc, H)   # (Hc, H)
        B = _exp_mat(Wc, W)   # (Wc, W)
        v = s.astype(jnp.float32)
        t = jax.lax.dot_general(v, A, (((1,), (0,)), ((), ())))  # (P, Wc, H)
        u = jax.lax.dot_general(t, B, (((1,), (0,)), ((), ())))  # (P, H, W)
        return u.astype(jnp.int32)

    def up_bcast(s):
        v = jnp.broadcast_to(s[:, :, None, :, None], (P, Hc, f, Wc, f))
        return v.reshape(P, H, W)

    cands = {
        "down/reshape": (down_reshape, xb),
        "down/rwin": (down_rwin, xb),
        "down/mxu": (down_mxu, xb),
        "down/slice": (down_slice, xb),
        "up/repeat": (up_repeat, sb),
        "up/mxu": (up_mxu, sb),
        "up/bcast": (up_bcast, sb),
    }

    ref_d = np.asarray(jax.jit(down_reshape)(xb))
    ref_u = np.asarray(jax.jit(up_repeat)(sb))

    def timed(fn, arg):
        @jax.jit
        def chained(a):
            def body(carry, i):
                ai = a.at[:, 0, 0].set(carry + i)
                d = fn(ai)
                return jnp.sum(d[:, -1, -1]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(4 * N))
            return c
        _ = np.asarray(chained(arg))
        t0 = time.perf_counter()
        _ = np.asarray(chained(arg))
        return (time.perf_counter() - t0) / (4 * N) / P * 1e3

    for name, (fn, arg) in cands.items():
        out = np.asarray(jax.jit(fn)(arg))
        ref = ref_d if name.startswith("down") else ref_u
        exact = bool((out == ref).all())
        ms = timed(fn, arg)
        print(f"{name:13s} {ms:7.4f} ms/frame  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
