"""Exact parity of speckle_filter vs cv2.filterSpeckles (the oracle).

The gather-free algorithm (label min-propagation + parent-forest counts +
taint, stereo/postprocess.py) claims EXACT cv2 semantics: remove
4-connected components (edges where |diff| <= maxDiff) of size
<= maxSpeckleSize. Randomized brute force over many small images is the
proof harness — any flaw in the taint/count argument shows up here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from stereo_vision_tpu.stereo.postprocess import speckle_filter


def _cv2_speckle(disp_i16, new_val, max_size, max_diff):
    out = disp_i16.copy()
    cv2.filterSpeckles(out, new_val, max_size, max_diff)
    return out


def _ours(disp_i16, new_val, max_size, max_diff):
    import jax.numpy as jnp

    out = speckle_filter(
        jnp.asarray(disp_i16, jnp.float32),
        max_diff=float(max_diff),
        max_speckle_size=max_size,
        invalid_value=float(new_val),
    )
    return np.asarray(out).astype(np.int16)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("max_size,max_diff", [(1, 1), (4, 1), (9, 2), (25, 1)])
def test_random_parity(seed, max_size, max_diff):
    rng = np.random.default_rng(100 * seed + max_size)
    H, W = 24, 31
    # Quantized values with many invalids -> plenty of small blobs.
    disp = rng.integers(0, 6, (H, W)).astype(np.int16) * 3
    disp[rng.random((H, W)) < 0.45] = -1
    ref = _cv2_speckle(disp, -1, max_size, max_diff)
    got = _ours(disp, -1, max_size, max_diff)
    np.testing.assert_array_equal(got, ref)


def test_large_blob_with_small_label_fragments():
    """A snake: one big component whose labels cannot converge in R rounds.

    This is the case the taint phase exists for — fragmented label regions
    would otherwise report small counts and wrongly remove the blob.
    """
    H, W = 9, 40
    disp = np.full((H, W), -1, np.int16)
    # Boustrophedon path of length ~3*W >> any small max_size.
    disp[1, 1:-1] = 10
    disp[1:4, -2] = 10
    disp[3, 1:-1] = 10
    disp[3:6, 1] = 10
    disp[5, 1:-1] = 10
    for max_size in (4, 10, 30):
        ref = _cv2_speckle(disp, -1, max_size, 1)
        got = _ours(disp, -1, max_size, 1)
        np.testing.assert_array_equal(got, ref)


def test_exact_boundary_size():
    """cv2 removes on size <= maxSpeckleSize (not <)."""
    disp = np.full((7, 9), -1, np.int16)
    disp[2, 2:5] = 8  # size-3 blob
    ref3 = _cv2_speckle(disp, -1, 3, 1)
    got3 = _ours(disp, -1, 3, 1)
    np.testing.assert_array_equal(got3, ref3)
    assert ref3[2, 2] == -1  # removed at S=3
    ref2 = _cv2_speckle(disp, -1, 2, 1)
    got2 = _ours(disp, -1, 2, 1)
    np.testing.assert_array_equal(got2, ref2)
    assert ref2[2, 2] == 8  # kept at S=2


def test_diff_edge_rule():
    """Components join on |diff| <= maxDiff exactly."""
    disp = np.full((5, 12), -1, np.int16)
    disp[2, 1:4] = 10
    disp[2, 4] = 12
    disp[2, 5:8] = 14  # one 7-blob at maxDiff=2; three small at maxDiff=1
    for md in (1, 2):
        ref = _cv2_speckle(disp, -1, 5, md)
        got = _ours(disp, -1, 5, md)
        np.testing.assert_array_equal(got, ref)


def test_speckle_size_zero_noop():
    disp = np.full((5, 5), -1, np.int16)
    disp[2, 2] = 4
    got = _ours(disp, -1, 0, 1)
    np.testing.assert_array_equal(got, disp)


def test_dense_quantized_720p_slice():
    """A denser, larger case closer to real SGBM output."""
    rng = np.random.default_rng(7)
    H, W = 60, 80
    base = rng.integers(20, 26, (H, W)).astype(np.int16)
    # carve invalid cracks to create isolated islands
    disp = base.copy()
    disp[rng.random((H, W)) < 0.25] = -1
    ref = _cv2_speckle(disp, -1, 20, 1)
    got = _ours(disp, -1, 20, 1)
    np.testing.assert_array_equal(got, ref)


class TestSpecklePallas:
    """The VMEM-resident Pallas formulation (speckle_pallas.py) must match
    the XLA formulation bit for bit (which itself is cv2 parity, above).
    It is NOT wired into the pipeline — measured 2x slower on the current
    Mosaic toolchain (see its module docstring) — but the capability is
    kept correct."""

    @pytest.mark.parametrize("seed,S,frac", [(0, 8, False), (1, 5, True), (2, 1, False)])
    def test_matches_xla_exactly(self, seed, S, frac):
        from stereo_vision_tpu.stereo.speckle_pallas import speckle_filter_pallas

        rng = np.random.default_rng(seed)
        H, W = 40, 60
        disp = np.where(
            rng.random((H, W)) < 0.65,
            np.floor(rng.uniform(0, 32 * 16, (H, W))),
            -16.0,
        ).astype(np.float32)
        inv, md = -16.0, 32.0
        if frac:
            disp, inv, md = disp / 16.0, -1.0, 2.0
        ref = np.asarray(speckle_filter(jnp.asarray(disp), md, S, inv))
        out = np.asarray(
            speckle_filter_pallas(jnp.asarray(disp), md, S, inv, interpret=True)
        )
        np.testing.assert_array_equal(out, ref)


def test_batched_leading_axis_matches_per_frame():
    """(P, H, W) input runs all frames in the same propagation rounds and
    must equal P independent per-frame filters exactly (the hier batch
    path relies on this)."""
    rng = np.random.default_rng(7)
    P, H, W = 3, 32, 48
    disp = np.where(
        rng.random((P, H, W)) < 0.6,
        np.floor(rng.uniform(0, 64, (P, H, W))),
        -1.0,
    ).astype(np.float32)
    batched = np.asarray(speckle_filter(jnp.asarray(disp), 2.0, 9, -1.0))
    for p in range(P):
        ref = np.asarray(speckle_filter(jnp.asarray(disp[p]), 2.0, 9, -1.0))
        np.testing.assert_array_equal(batched[p], ref)


class TestMaxDiameter:
    """Bounded-diameter relaxation (speckle_filter(max_diameter=...)):
    blobs of graph diameter <= cap keep EXACT cv2 semantics; the only
    allowed deviation is KEEPING a small-but-elongated blob cv2 removes
    (one-sided). Used by the hier fast modes where the headline gate is
    agreement, not bit-exactness."""

    def test_compact_blobs_still_exact(self):
        rng = np.random.default_rng(3)
        H, W = 24, 31
        disp = rng.integers(0, 6, (H, W)).astype(np.int16) * 3
        disp[rng.random((H, W)) < 0.45] = -1
        ref = _cv2_speckle(disp, -1, 9, 2)
        out = speckle_filter(
            jnp.asarray(disp, jnp.float32), 2.0, 9, -1.0, max_diameter=8
        )
        # S=9 blobs have diameter <= 8, so the cap changes nothing.
        np.testing.assert_array_equal(np.asarray(out).astype(np.int16), ref)

    def test_one_sided_vs_cv2(self):
        """A 1-px snake (size 20, diameter 19) under cap 6: kept by the
        capped filter, removed by cv2 at S=20 — and that is the ONLY kind
        of difference allowed."""
        disp = np.full((9, 24), -1, np.int16)
        disp[1, 1:11] = 10
        disp[1:4, 10] = 10
        disp[3, 3:11] = 10  # snake, ~20 px
        disp[6, 2:4] = 5    # compact 2-px blob, diameter 1
        ref = _cv2_speckle(disp, -1, 20, 1)
        out = np.asarray(
            speckle_filter(jnp.asarray(disp, jnp.float32), 1.0, 20, -1.0, max_diameter=6)
        ).astype(np.int16)
        assert ref[1, 1] == -1 and out[1, 1] == 10  # snake kept only by capped
        assert ref[6, 2] == -1 and out[6, 2] == -1  # compact blob removed by both
        diff = out != ref
        # every difference is "we kept what cv2 removed", never the reverse
        assert np.all(out[diff] == disp[diff]) and np.all(ref[diff] == -1)

    @pytest.mark.parametrize("seed", range(4))
    def test_randomized_one_sidedness(self, seed):
        rng = np.random.default_rng(50 + seed)
        H, W = 28, 35
        disp = rng.integers(0, 5, (H, W)).astype(np.int16) * 2
        disp[rng.random((H, W)) < 0.5] = -1
        ref = _cv2_speckle(disp, -1, 25, 1)
        out = np.asarray(
            speckle_filter(jnp.asarray(disp, jnp.float32), 1.0, 25, -1.0, max_diameter=6)
        ).astype(np.int16)
        diff = out != ref
        assert np.all(out[diff] == disp[diff]) and np.all(ref[diff] == -1)
