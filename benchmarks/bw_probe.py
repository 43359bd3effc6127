"""HBM bandwidth probe: chained x+1 passes at several array sizes.

Separates fixed per-pass overhead from true bandwidth: ms per pass vs
bytes moved. Also probes f32 vs int32.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    for P, dt in [(2, "int32"), (8, "int32"), (32, "int32"), (8, "float32")]:
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (P, 720, 1280)),
            dtype=dt,
        )
        K = 32  # passes per iteration, amortizing carry/reduce overhead

        @jax.jit
        def chained(a):
            def body(c, i):
                v = a + c
                for _ in range(K):
                    v = jnp.abs(v + 1)  # abs blocks add-chain folding
                return jnp.max(v[:, -1, -2]).astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(10))
            return c

        _ = np.asarray(chained(x))
        t0 = time.perf_counter()
        _ = np.asarray(chained(x))
        dt_s = (time.perf_counter() - t0) / 10 / K
        mb = x.size * x.dtype.itemsize / 1e6
        print(
            f"P={P:3d} {dt:8s} {dt_s*1e3:8.4f} ms/pass  "
            f"{2 * mb / 1e3 / dt_s:7.1f} GB/s eff",
            flush=True,
        )


if __name__ == "__main__":
    main()
