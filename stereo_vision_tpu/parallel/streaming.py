"""Sharded batched stereo-stream processing (BASELINE.json config #5).

The reference processes video strictly one frame at a time on the host
(``while cap.isOpened()`` — 3dpose.py:358, ball_drop.py:380). Here a
window of frames from any number of streams is one device program:

  (B, H, W) left+right batches -> rectify-remap -> disparity -> depth

sharded over the (data, space) mesh: streams/frames on ``data``, image
rows on ``space`` for the remap (per-pixel independent), with the
disparity matcher data-parallel per pair. Host video decode feeds the
device via double-buffered ``jax.device_put`` (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_vision_tpu.ops.remap import make_remap, remap_bilinear
from stereo_vision_tpu.stereo.bm import StereoBMParams, stereo_bm
from stereo_vision_tpu.stereo.depth import reproject_disparity_to_3d
from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, stereo_sgbm
from stereo_vision_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


def _frame_stats(disp: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) disparity + (B, H, W, 3) points -> (B, 2) per-frame
    [valid_fraction, median_depth] computed ON DEVICE.

    Shipping full disparity+points windows to the host costs ~15 MB per
    720p frame; when the consumer only wants per-frame statistics (the
    `stream` CLI without --video-out) this reduces host transfer to two
    floats per frame — the difference between transfer-bound and
    compute-bound streaming on any host whose device link is slower
    than the matcher (measured: the remote-tunnel dev box streams at
    ~1 fps shipping volumes vs decode 245 fps; docs/stream_e2e.md).
    d == 0 is excluded from validity to keep depth finite through Q
    (Q[3,3] ~ 0 maps disparity 0 to infinity)."""
    valid = disp > 0
    vf = valid.mean(axis=(1, 2))
    z = jnp.where(valid, pts[..., 2], jnp.nan)
    med = jnp.nanmedian(z, axis=(1, 2))
    return jnp.stack([vf, med], axis=-1)


def batched_stereo_pipeline(
    left: jnp.ndarray,
    right: jnp.ndarray,
    maps: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    Q: jnp.ndarray,
    matcher: str = "sgbm",
    params: StereoBMParams | StereoSGBMParams | None = None,
    hier_params=None,
    stats_only: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W) raw pairs -> (disparity (B, H, W), points3d (B, H, W, 3)).

    One traced program: remap both views, run the dense matcher, reproject
    through Q. vmap carries the batch axis; shard the inputs to distribute.
    With ``stats_only`` the program instead returns the (B, 2) per-frame
    [valid_fraction, median_depth] array (see :func:`_frame_stats`).
    """
    mx1, my1, mx2, my2 = maps
    H, W = mx1.shape
    remap_l = make_remap(mx1, my1, (H, W))
    remap_r = make_remap(mx2, my2, (H, W))

    if matcher == "sgbm_hier":
        # Lane-packed hierarchical mode (stereo/hier.py): the whole pack
        # runs in ONE set of banded Pallas kernels, so the batch is
        # remapped first and handed over un-vmapped. Requires
        # B == 128 // band: pass hier_params explicitly, or it is chosen
        # by the batch size (8 -> HIER_FAST band 16, 4 -> band-32 default).
        from stereo_vision_tpu.stereo.hier import (
            HIER4_FAST,
            HIER8_FAST,
            HIER_FAST,
            HierParams,
            stereo_sgbm_hier_batch,
        )

        if hier_params is None:
            hier_params = {8: HIER_FAST, 16: HIER8_FAST, 32: HIER4_FAST}.get(
                left.shape[0], HierParams()
            )

        def prep(m):
            def one(x):
                return jnp.round(m(x.astype(jnp.float32))).astype(jnp.int32)

            return jax.vmap(one)

        lr = prep(remap_l)(left)
        rr = prep(remap_r)(right)
        disp = stereo_sgbm_hier_batch(
            lr, rr, params or StereoSGBMParams(), hier_params,
            # Pallas kernels need interpret mode off-TPU (CPU tests).
            interpret=jax.default_backend() in ("cpu", "gpu"),
        )
        pts = jax.vmap(lambda d: reproject_disparity_to_3d(d, Q))(disp)
        if stats_only:
            return _frame_stats(disp, pts)
        return disp, pts

    def one(l, r):
        # Round to integer intensities (cv2 remaps uint8 -> uint8) before
        # the integer-cost matchers.
        lr = jnp.round(remap_l(l.astype(jnp.float32))).astype(jnp.int32)
        rr = jnp.round(remap_r(r.astype(jnp.float32))).astype(jnp.int32)
        if matcher == "sgbm":
            disp = stereo_sgbm(lr, rr, params or StereoSGBMParams())
        elif matcher == "bm":
            disp = stereo_bm(lr, rr, params or StereoBMParams())
        else:
            raise ValueError(f"unknown matcher: {matcher}")
        pts = reproject_disparity_to_3d(disp, Q)
        return disp, pts

    disp, pts = jax.vmap(one)(left, right)
    if stats_only:
        return _frame_stats(disp, pts)
    return disp, pts


def make_sharded_pipeline(
    mesh: Mesh,
    maps,
    Q,
    matcher: str = "sgbm",
    params=None,
    hier_params=None,
    stats_only: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]:
    """jit the batched pipeline with stream-batch sharding over ``data``.

    The returned function takes (B, H, W) uint8 arrays; B must be divisible
    by the mesh's data-axis size. For ``sgbm_hier`` the pipeline runs under
    shard_map so each device gets a full 128-lane pack (B per device must
    equal 128 // band); bm/sgbm are vmapped per frame and partition under
    plain jit+shardings. ``stats_only``: the program returns only the
    (B, 2) per-frame stats (see :func:`_frame_stats`).
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    out_spec = P(DATA_AXIS) if stats_only else (P(DATA_AXIS), P(DATA_AXIS))
    out_sh = batch_sh if stats_only else (batch_sh, batch_sh)

    fn = functools.partial(
        batched_stereo_pipeline, maps=maps, Q=Q, matcher=matcher,
        params=params, hier_params=hier_params, stats_only=stats_only,
    )
    if matcher == "sgbm_hier":
        fn = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=out_spec,
            check_vma=False,
        )
    jfn = jax.jit(
        fn,
        in_shardings=(batch_sh, batch_sh),
        out_shardings=out_sh,
    )

    def run(left, right):
        return jfn(jax.device_put(left, batch_sh), jax.device_put(right, batch_sh))

    return run


class StereoStreamProcessor:
    """Double-buffered host->device streaming around the sharded pipeline.

    The host enqueues the next window (``jax.device_put`` is async) while
    the device crunches the current one — the framework's replacement for
    the reference's decode-then-process frame loop.
    """

    def __init__(
        self, mesh: Mesh, maps, Q, matcher: str = "sgbm", params=None,
        hier_params=None,
    ):
        self.mesh = mesh
        self._sh = NamedSharding(mesh, P(DATA_AXIS))
        self._fn = make_sharded_pipeline(
            mesh, maps, Q, matcher, params, hier_params
        )
        self._pending = None

    def submit(self, left: np.ndarray, right: np.ndarray) -> None:
        """Enqueue a (B, H, W) window; returns immediately."""
        l = jax.device_put(jnp.asarray(left), self._sh)
        r = jax.device_put(jnp.asarray(right), self._sh)
        out = self._fn(l, r)
        prev, self._pending = self._pending, out
        # Keep at most one window in flight beyond the current one.
        if prev is not None:
            jax.block_until_ready(prev[0])

    def drain(self):
        """Wait for and return the last submitted window's results."""
        if self._pending is None:
            return None
        disp, pts = self._pending
        jax.block_until_ready(disp)
        self._pending = None
        return np.asarray(disp), np.asarray(pts)


def stream_video_pair(
    left_path,
    right_path,
    mesh: Mesh,
    maps,
    Q,
    matcher: str = "sgbm_hier",
    params=None,
    hier_params=None,
    window: int = 8,
    left_start: int = 0,
    right_start: int = 0,
    max_frames: int | None = None,
    depth: int = 3,
    stats_only: bool = False,
):
    """Decode → disparity → 3D streaming over a synchronized video pair.

    Three overlapped stages replace the reference's serial per-frame loop
    (3dpose.py:358, ball_drop.py:380):

      1. host decode + native RGB→gray pack (`io.loader.StereoPairLoader` —
         decode thread + C++ frame ring),
      2. async `device_put` of the next window while
      3. the device runs the current window's remap→matcher→Q program.

    Yields ``(seq, disparity (T, H, W), points3d (T, H, W, 3), n_valid)``
    per window, in stream order; the final window is padded to the window
    size with ``n_valid`` marking the real frames. ``window`` must match
    the matcher's pack size for ``sgbm_hier`` (8 for HIER_FAST). With
    ``stats_only`` the per-frame stats stay on device until the yield and
    the tuple becomes ``(seq, stats (T, 2), None, n_valid)`` — two floats
    per frame of host transfer instead of ~15 MB (see _frame_stats).
    """
    import collections

    from stereo_vision_tpu.io.loader import StereoPairLoader

    loader = StereoPairLoader(
        left_path, right_path, window,
        left_start=left_start, right_start=right_start,
        max_frames=max_frames, depth=depth,
    )
    fn = make_sharded_pipeline(
        mesh, maps, Q, matcher, params, hier_params, stats_only=stats_only
    )

    def emit(item):
        s, nv, out = item
        if stats_only:
            jax.block_until_ready(out)
            return s, np.asarray(out), None, nv
        disp, pts = out
        jax.block_until_ready(disp)
        return s, np.asarray(disp), np.asarray(pts), nv

    inflight: collections.deque = collections.deque()
    try:
        for seq, wl, wr, n_valid in loader:
            # Dispatch is async: the device starts on this window while the
            # loader thread decodes the next one.
            inflight.append((seq, n_valid, fn(wl, wr)))
            if len(inflight) > 1:
                yield emit(inflight.popleft())
        while inflight:
            yield emit(inflight.popleft())
    finally:
        loader.close()
