"""Disparity post-processing: left-right consistency and speckle filtering.

TPU-native equivalents of cv2's validateDisparity and filterSpeckles
(capability extension per /root/repo/BASELINE.json config #2: "subpixel +
LR-check + speckle filter"). Everything is expressed as bounded iterative
elementwise/gather passes (jit/vmap-friendly, no host loops).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def left_right_check(
    disp_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    max_diff: float = 1.0,
    invalid_value: float = -1.0,
    max_disparity: int | None = None,
) -> jnp.ndarray:
    """Invalidate left-disparity pixels failing LR consistency.

    For left pixel x with disparity d, the matching right pixel is x - d;
    consistency requires |disp_right[x - d] - d| <= max_diff (cv2
    validateDisparity semantics with precomputed right disparity).

    max_disparity: static upper bound on round(disp_left). When given,
    the disp_right lookup runs as max_disparity+1 static shifts +
    selects instead of a per-pixel gather — on TPU the gather costs
    ~12 ms per 720p map while the shifted form costs ~2 ms (the same
    rewrite as the SGBM-internal LR check). Pass it whenever the
    disparity range is known (it always is for BM/SGBM outputs).
    """
    H, W = disp_left.shape
    xr_off = jnp.round(disp_left).astype(jnp.int32)  # right pixel = x - off
    if max_disparity is not None:
        Dm = int(max_disparity)
        oob = jnp.float32(jnp.inf)  # |inf - d| > max_diff -> fails, like OOR
        d2p = jnp.concatenate(
            [jnp.full((H, Dm), oob, disp_right.dtype), disp_right], axis=1
        )
        d2 = jnp.full((H, W), oob, disp_right.dtype)
        for dd in range(0, Dm + 1):
            sh = d2p[:, Dm - dd : Dm - dd + W]
            d2 = jnp.where(xr_off == dd, sh, d2)
        in_range = (xr_off >= 0) & (xr_off <= Dm)
    else:
        xr = jnp.arange(W)[None, :].astype(jnp.int32) - xr_off
        in_range = (xr >= 0) & (xr < W)
        d2 = jnp.take_along_axis(disp_right, jnp.clip(xr, 0, W - 1), axis=1)
    ok = in_range & (jnp.abs(d2 - disp_left) <= max_diff) & (disp_left >= 0)
    return jnp.where(ok, disp_left, invalid_value)


def connected_component_labels(
    same_blob_adjacency: list[jnp.ndarray],
    valid: jnp.ndarray,
    rounds: int | None = None,
) -> jnp.ndarray:
    """4-neighbor connected-component labels via min-propagation + pointer
    jumping (Shiloach-Vishkin style), O(log(H*W)) rounds.

    Args:
      same_blob_adjacency: 4 boolean (H, W) masks for neighbors at
        (+y, -y, +x, -x) — True where the neighbor belongs to the same blob.
      valid: (H, W) bool; invalid pixels are singleton components.
      rounds: propagation rounds; default ceil(log2(H*W)) + 2.

    Returns:
      (H, W) int32 labels: the min flat index of each pixel's component.
    """
    H, W = valid.shape
    if rounds is None:
        rounds = int(math.ceil(math.log2(max(H * W, 2)))) + 2
    labels = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    big = jnp.int32(H * W)  # sentinel for padding (never a real label)

    offs = ((1, 0), (-1, 0), (0, 1), (0, -1))

    def neighbor_min(lab):
        lpad = jnp.pad(lab, ((1, 1), (1, 1)), constant_values=big)
        out = lab
        for (dy, dx), m in zip(offs, same_blob_adjacency):
            ln = lpad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
            out = jnp.where(m, jnp.minimum(out, ln), out)
        return out

    def hop(lab):
        # label <- label of the pixel this label points to (path halving).
        return lab.reshape(-1)[lab.reshape(-1)].reshape(H, W)

    def body(_, lab):
        return hop(hop(neighbor_min(lab)))

    return jax.lax.fori_loop(0, rounds, body, labels)


_OFFS = ((1, 0), (-1, 0), (0, 1), (0, -1))
_OPP = (1, 0, 3, 2)


@functools.partial(jax.jit, static_argnames=("max_speckle_size", "max_diameter"))
def speckle_filter(
    disp: jnp.ndarray,
    max_diff: float = 1.0,
    max_speckle_size: int = 100,
    invalid_value: float = -1.0,
    max_diameter: int | None = None,
) -> jnp.ndarray:
    """Remove small disparity blobs — exact cv2.filterSpeckles semantics.

    4-connected components of valid pixels joined where neighbor
    disparities differ by <= ``max_diff``; components of size
    <= ``max_speckle_size`` are set to ``invalid_value`` (cv2 5.0 removes
    on ``count <= maxSpeckleSize``, verified empirically).

    TPU-native, **gather/scatter-free** exact algorithm (the pointer-
    jumping CCL it replaces cost ~310 ms at 720p — 44 full-image gathers;
    every phase here is shifted elementwise ops):

    Let S = max_speckle_size, R = S - 1.

    1. R rounds of 4-neighbor label min-propagation over same-blob edges,
       recording the arrival round ``A[p]`` = last round the label changed.
       Any component of size <= S has diameter <= S-1 = R, so its labels
       converge EXACTLY to the component-min flat index, and A = BFS depth
       from that min pixel.
    2. Parent forest: parent(p) = first same-blob neighbor with equal
       label and strictly smaller A (the min pixel is the root). A is
       strictly decreasing along parent links, so every tree has depth
       <= R. R rounds of child-sum up-sweep give the root its exact tree
       size; R rounds of parent-copy down-broadcast give it to every node.
       For a converged component the tree IS the component (BFS tree), so
       the broadcast count is the exact component size.
    3. Taint: a component that did NOT converge must contain a same-blob
       edge with differing final labels. Seed taint at both endpoints of
       every such edge and OR-propagate through same-blob edges for 2R
       rounds. Proof of exactness: if p is untainted, let l = label(p),
       src = pixel l; every pixel with final label l lies within R hops of
       src (labels travel 1 hop/round), and p itself is within R of src.
       If p's component were non-converged, the label-l set would be a
       proper subset of the (connected) component, so a differing-label
       cut edge (u, v) exists with label(u) = l; u is within R of src,
       hence within 2R of p — p would be tainted. Contradiction. So
       untainted => component converged => count exact. Conversely a
       non-converged component has a pixel whose label differs from the
       component min, i.e. > R hops from it => size >= R+2 > S => keeping
       every tainted pixel is correct. Converged components have no seeds
       and taint cannot cross components, so they are never tainted.

    Total: ~5R rounds of cheap elementwise work (measured ~2 orders of
    magnitude faster than the gather formulation on TPU at 720p).

    max_diameter: optional cap on R (the propagation radius). The round
    count — hence the filter's entire cost — is proportional to R, and
    R = S - 1 is only needed for the worst-case blob shape (a 1-px-wide
    snake of S pixels). With R capped, every blob of graph diameter
    <= R is still handled EXACTLY (converged => exact count => cv2
    decision), while blobs of diameter > R but size <= S are KEPT where
    cv2 would remove them — a one-sided relaxation that only affects
    1-px-thin elongated blobs (any blob 2+ px thick and <= S px has
    diameter <= ~S/2 + 1). Used by the hier fast modes
    (HierParams.speckle_diameter), which are agreement-gated rather
    than bit-exact; leave None for exact cv2.filterSpeckles semantics.
    """
    # Accepts (..., H, W): leading batch axes run all frames inside the
    # SAME propagation rounds (one fori_loop for the whole pack — the
    # hier/batch paths call this with (P, H, W), amortizing per-round
    # loop overhead instead of running P sequential filters). No shift
    # ever crosses the batch axes, so per-frame semantics are identical.
    H, W = disp.shape[-2:]
    S = int(max_speckle_size)
    if S <= 0:
        return disp
    R = S - 1 if max_diameter is None else min(S - 1, int(max_diameter))
    R = max(R, 1)
    valid = disp > invalid_value
    zpad = tuple((0, 0) for _ in disp.shape[:-2])

    def nb(a, i, fill):
        """Value of ``a`` at p + _OFFS[i] (pad with ``fill``)."""
        dy, dx = _OFFS[i]
        ap = jnp.pad(a, zpad + ((1, 1), (1, 1)), constant_values=fill)
        return ap[..., 1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]

    masks = [
        valid & nb(valid, i, False) & (jnp.abs(nb(disp, i, jnp.inf) - disp) <= max_diff)
        for i in range(4)
    ]

    big = jnp.int32(H * W)
    labels0 = jnp.broadcast_to(
        jnp.arange(H * W, dtype=jnp.int32).reshape(H, W), disp.shape
    )

    # Phase 1: R rounds of min-propagation, tracking arrival round A.
    def prop(r, carry):
        lab, A = carry
        new = lab
        for i in range(4):
            new = jnp.where(masks[i], jnp.minimum(new, nb(lab, i, big)), new)
        A = jnp.where(new < lab, r, A)
        return new, A

    lab, A = jax.lax.fori_loop(
        1, R + 1, prop, (labels0, jnp.zeros(disp.shape, jnp.int32))
    )

    # Phase 2: parent direction (4 = root). First qualifying neighbor in
    # fixed order; reverse iteration + overwrite picks the first.
    pdir = jnp.full(disp.shape, 4, jnp.int32)
    for i in (3, 2, 1, 0):
        ok = masks[i] & (nb(lab, i, big) == lab) & (nb(A, i, big) < A)
        pdir = jnp.where(ok, i, pdir)
    child = [nb(pdir, i, 4) == _OPP[i] for i in range(4)]

    # Phase 3: up-sweep — s^(t)[p] = descendants of p within t levels.
    def up(_, s):
        out = jnp.ones(disp.shape, jnp.int32)
        for i in range(4):
            out = out + jnp.where(child[i], nb(s, i, 0), 0)
        return out

    s = jax.lax.fori_loop(0, R, up, jnp.ones(disp.shape, jnp.int32))

    # Phase 4: down-broadcast the root's exact tree size.
    def down(_, t):
        out = t
        for i in range(4):
            out = jnp.where(pdir == i, nb(t, i, 0), out)
        return out

    total = jax.lax.fori_loop(0, R, down, jnp.where(pdir == 4, s, 0))

    # Phase 5: taint — seed at differing-label same-blob edges, OR-spread.
    seed = jnp.zeros(disp.shape, bool)
    for i in range(4):
        seed = seed | (masks[i] & (nb(lab, i, big) != lab))

    def spread(_, t):
        out = t
        for i in range(4):
            out = out | (masks[i] & nb(t, i, False))
        return out

    taint = jax.lax.fori_loop(0, 2 * R, spread, seed)

    remove = valid & ~taint & (total <= S)
    return jnp.where(remove, invalid_value, disp)
