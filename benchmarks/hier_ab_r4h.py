"""r4h chip A/B: speckle diameter cap in the hier8x3 headline mode.

Speckle is 0.376 ms/frame of the 3.16 ms budget (hier_split_r4.py) and
its elementwise rounds are proportional to the diameter cap. CPU pins
are deterministic per cap (fixed seeds, exact arithmetic) and all PASS
at caps 8/6/4 (see docs/sgbm_roofline.md "Round 4f"); this measures the
speed side. Result: cap8 291.6 / cap6 297.2 / cap4 302.8 Mpx/s — cap 4
adopted into HIER8_FAST. Run alone on an idle chip.
"""

import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax, jax.numpy as jnp
from bench import _scene, H, W, D
from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams
from stereo_vision_tpu.stereo.hier import HIER8_FAST, stereo_sgbm_hier_batch

N = 50
left, right = _scene()
p3 = StereoSGBMParams(
    num_disparities=D, block_size=5, uniqueness_ratio=10,
    disp12_max_diff=1, speckle_window_size=100, speckle_range=2, num_paths=3,
)
def run(name, hp):
    P = 128 // hp.band
    lb = jnp.asarray(np.stack([left] * P)); rb = jnp.asarray(np.stack([right] * P))
    fn = lambda l, r: stereo_sgbm_hier_batch(l, r, p3, hp)
    @jax.jit
    def chained(l, r):
        def body(carry, i):
            li = l.at[:, 0, 0].set(carry + i)
            d = fn(li, r)
            return jnp.sum(d[:, H // 2, W // 2]).astype(jnp.int32) & 1, ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N))
        return c
    _ = np.asarray(chained(lb, rb))
    reps = []
    for _i in range(4):
        t0 = time.perf_counter(); _ = np.asarray(chained(lb, rb))
        reps.append(P * H * W / ((time.perf_counter() - t0) / N) / 1e6)
    print(f"{name:6s} mpxs={' '.join(f'{r:.1f}' for r in reps)}", flush=True)

for name, hp in (("cap8", HIER8_FAST),
                 ("cap6", HIER8_FAST._replace(speckle_diameter=6)),
                 ("cap4", HIER8_FAST._replace(speckle_diameter=4))):
    run(name, hp)
