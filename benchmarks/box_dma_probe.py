"""Probe: is the aligned-box kernel's ~5x re-read of the pix volume a
real DMA stall, or fully hidden behind its vector compute?

The r3n trace puts box at 4.6 ms/pack while its streamed traffic is
~1.07 GB of pix re-reads (five clamped single-row specs over the
(H, Wv, 128) int16 volume) + ~0.13 GB of s rows + the 0.19 GB output —
~1.6 ms at the ~820 GB/s HBM floor. A pix+box fusion (rolling 5-row
pix scratch inside the box kernel) would delete the pix write + all
five re-reads, but only pays if the kernel actually WAITS on them.

Arms (identical per-step vector work and output traffic):
  real   — production ``aligned_box_packed``.
  frozen — same pallas_call with every pix index map pinned to row 0:
           Mosaic elides the copy for a block whose index is unchanged
           from the previous grid step, so pix read traffic ~0 (output
           values are wrong; timing is data-independent).

real - frozen bounds the saving a fusion could recover. If ~0, the
kernel is issue-bound and the fusion loses by the r3m rule (compute
added to the fused dispatch with no DMA slack to hide it).

Run alone on the chip; redirect output to a file (CLAUDE.md rules).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import H, W, D, N
    from stereo_vision_tpu.stereo import banded_pallas as bp

    band, G, P = 16, 8, 8
    min_x = D
    x0, out_off = min_x - 8, 8
    Wv = W - x0
    Wo = Wv - out_off

    rng = np.random.default_rng(0)
    pix = jnp.asarray(
        rng.integers(0, 2000, (H, Wv, 128), dtype=np.int16))
    s = jnp.asarray(
        (rng.integers(0, (D - band) // G + 1, (P, H // 4, Wv // 4)) * G)
        .repeat(4, 1).repeat(4, 2)[:, :H, :Wv].astype(np.int32))

    def box_frozen(pix, s, interpret=False):
        """aligned_box_packed's in-kernel-deltas branch with the five
        pix index maps pinned to row 0 (read elision after step 0)."""
        Hh, Ww = pix.shape[0], pix.shape[1]
        s_t = jnp.moveaxis(s, 0, 1).astype(jnp.int32)

        def spec_s(dy):
            return pl.BlockSpec(
                (1, P, Ww),
                lambda y, dy=dy: (jnp.clip(y + dy, 0, Hh - 1), 0, 0),
                memory_space=pltpu.VMEM,
            )

        frozen = pl.BlockSpec(
            (1, Ww, 128), lambda y: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, Ww - out_off, 128), lambda y: (y, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(
            bp._aligned_box_kernel_srows, P, band, G, 5, Hh, Ww, out_off
        )
        return pl.pallas_call(
            kern,
            grid=(Hh,),
            in_specs=[frozen] * 5 + [spec_s(d) for d in (-2, -1, 0, 1, 2)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Hh, Ww - out_off, 128), jnp.int16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(pix, pix, pix, pix, pix, s_t, s_t, s_t, s_t, s_t)

    def run(name, fn):
        @jax.jit
        def chained(pix, s):
            def body(carry, i):
                pi = pix.at[0, 0, 0].set((carry + i).astype(jnp.int16))
                out = fn(pi, s)
                return out[H // 2, Wo // 2, 0].astype(jnp.int32) & 1, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
            return c

        _ = np.asarray(chained(pix, s))
        reps = []
        for _i in range(4):
            t0 = time.perf_counter()
            _ = np.asarray(chained(pix, s))
            reps.append((time.perf_counter() - t0) / N * 1e3)
        print(f"{name:8s} ms/pack: "
              + " ".join(f"{r:.3f}" for r in reps), flush=True)
        return min(reps)

    real = run("real", lambda p_, s_: bp.aligned_box_packed(
        p_, s_, band, G, 5, out_off=out_off))
    froz = run("frozen", box_frozen)
    print(f"stall bound: {real - froz:.3f} ms/pack "
          f"({(real - froz) / real * 100:.1f}% of box)", flush=True)


if __name__ == "__main__":
    main()
