"""Multi-chip SGM aggregation: H-banded, frame-pipelined over the mesh.

The 8-path aggregation is the only part of the SGBM pipeline with a
cross-image sequential dependency (the cost volume and WTA stages are
embarrassingly row-parallel given small halos). This module shards the
row axis into one band per device on the ``space`` mesh axis and runs the
vertical/diagonal scans as a device pipeline:

  - The three *downward* directions (0,1), (1,1), (-1,1) sweep bands in
    device order 0 -> S-1; the three *upward* ones sweep S-1 -> 0. The
    horizontal pair never crosses a band boundary and is computed locally.
  - The inter-band carry is exactly the per-direction SGM state at the
    boundary row — (L, minL) per direction, (W, D) + (W, 1) — moved one
    device over ICI with ``lax.ppermute``. The non-wrapping permutation
    delivers zeros at the pipeline head, which is precisely SGM's border
    initialisation (L = 0, minL = 0), so band 0 needs no special case.
  - A single frame serializes across bands (device s idles until s-1
    finishes), so the pipeline runs over a *stream*: at tick t device s
    aggregates the downward set of frame t - s and the upward set of
    frame t - (S-1-s). With F frames the whole batch finishes in
    F + S - 1 ticks — throughput approaches S x single-device for
    F >> S, and each device only ever holds its own band (HBM per chip
    drops by S, which is what lets >720p volumes fit at all).

Results are bit-exact vs the single-device scan backend
(``stereo.sgbm._aggregate_8``); tests assert equality on a virtual mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_vision_tpu.parallel.mesh import SPACE_AXIS
from stereo_vision_tpu.stereo.sgbm import (
    _aggregate_horiz,
    _sgm_update,
    _shift_cols,
)


def _zero_carry(W: int, D: int):
    z = (jnp.zeros((W, D), jnp.int32), jnp.zeros((W, 1), jnp.int32))
    return (z, z, z)


def _band_scan(c_band, carry, P1, P2, with_diag):
    """Scan one band of rows with an injected boundary carry.

    carry: ((Lv, mv), (Ld, md), (Lu, mu)) — the vertical and the two
    diagonal direction states of the row just above the band (the
    diagonals' column shift happens inside the step, so the carry crosses
    the band boundary untransformed).
    """

    def step(cr, c_row):
        (Lv, mv), (Ld, md), (Lu, mu) = cr
        Lv2, mv2 = _sgm_update(c_row, Lv, mv, P1, P2)
        if with_diag:
            Ld2, md2 = _sgm_update(
                c_row, _shift_cols(Ld, 1), _shift_cols(md, 1), P1, P2
            )
            Lu2, mu2 = _sgm_update(
                c_row, _shift_cols(Lu, -1), _shift_cols(mu, -1), P1, P2
            )
            out = Lv2 + Ld2 + Lu2
        else:
            Ld2, md2, Lu2, mu2 = Ld, md, Lu, mu
            out = Lv2
        return ((Lv2, mv2), (Ld2, md2), (Lu2, mu2)), out

    carry2, S = jax.lax.scan(step, carry, c_band)
    return S, carry2


@functools.partial(jax.jit, static_argnames=("P1", "P2", "num_paths", "mesh", "axis"))
def sgm_aggregate_sharded(
    C: jnp.ndarray,
    P1: int,
    P2: int,
    mesh: Mesh,
    num_paths: int = 8,
    axis: str = SPACE_AXIS,
) -> jnp.ndarray:
    """Aggregate a stream of cost volumes over a device pipeline.

    Args:
      C: (F, H, W, D) integer cost volumes (frames F is the pipeline
        axis); H must divide evenly into mesh.shape[axis] bands.
      mesh: device mesh; the row axis is sharded over ``axis``.

    Returns:
      (F, H, W, D) int32 aggregated volume, sharded like the input —
      bit-exact vs per-frame ``_aggregate_8(C[f], P1, P2, 'scan')``.
    """
    F, H, W, D = C.shape
    S = mesh.shape[axis]
    if H % S:
        raise ValueError(f"H={H} must be divisible by the band count {S}")
    Hb = H // S
    with_diag = num_paths >= 8
    fwd = [(i, i + 1) for i in range(S - 1)]   # zeros enter at device 0
    bwd = [(i + 1, i) for i in range(S - 1)]   # zeros enter at device S-1

    def body(C_loc):  # per-device: (F, Hb, W, D)
        s = jax.lax.axis_index(axis)

        def grab(f):
            fc = jnp.clip(f, 0, F - 1)
            return jax.lax.dynamic_slice(
                C_loc, (fc, 0, 0, 0), (1, Hb, W, D)
            )[0].astype(jnp.int32)

        def put(buf, f, val, valid):
            fc = jnp.clip(f, 0, F - 1)
            cur = jax.lax.dynamic_slice(buf, (fc, 0, 0, 0), (1, Hb, W, D))
            return jax.lax.dynamic_update_slice(
                buf, jnp.where(valid, val[None], cur), (fc, 0, 0, 0)
            )

        def tick(carry, t):
            dn_c, up_c, out_dn, out_up = carry
            f_dn = t - s
            f_up = t - (S - 1 - s)

            band_dn = grab(f_dn)
            S_dn, dn_out = _band_scan(band_dn, dn_c, P1, P2, with_diag)
            # Horizontal pair: band-local, folded in on the downward tick.
            Sh = _aggregate_horiz(
                jnp.stack([band_dn, jnp.flip(band_dn, 1)]), P1, P2
            )
            S_dn = S_dn + Sh[0] + jnp.flip(Sh[1], 1)

            band_up = jnp.flip(grab(f_up), 0)  # upward = y-flipped scan
            S_up_f, up_out = _band_scan(band_up, up_c, P1, P2, with_diag)
            S_up = jnp.flip(S_up_f, 0)

            out_dn = put(out_dn, f_dn, S_dn, (t >= s) & (f_dn < F))
            ok_up = (t >= S - 1 - s) & (f_up < F)
            out_up = put(out_up, f_up, S_up, ok_up)

            # Move the boundary states one band over ICI. Out-of-range
            # ticks circulate garbage, but a device's first valid tick
            # always receives the carry of the neighbour's valid tick for
            # the same frame (f = t - s is invariant under (t+1, s+1)).
            perm = lambda p: lambda x: jax.lax.ppermute(x, axis, p)
            dn_next = jax.tree.map(perm(fwd), dn_out)
            up_next = jax.tree.map(perm(bwd), up_out)
            return (dn_next, up_next, out_dn, out_up), None

        zeros = jnp.zeros((F, Hb, W, D), jnp.int32)
        init = (_zero_carry(W, D), _zero_carry(W, D), zeros, zeros)
        (_, _, out_dn, out_up), _ = jax.lax.scan(
            tick, init, jnp.arange(F + S - 1)
        )
        return out_dn + out_up

    spec = P(None, axis, None, None)
    C = jax.lax.with_sharding_constraint(C, NamedSharding(mesh, spec))
    # check_vma off: the lax.scan carries start as unvarying zeros and
    # become device-varying after the first ppermute, which the static
    # vma check can't type.
    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(C)
