"""Packed banded Pallas kernels vs the lax.scan reference — EXACT equality.

Parity thresholds are too loose to catch lane-packing/alignment bugs
(CLAUDE.md convention): every kernel is asserted bit-identical to
stereo_vision_tpu.stereo.banded on random scenes with tile-constant
shift maps, in Pallas interpret mode on the CPU mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stereo_vision_tpu.stereo.sgbm import StereoSGBMParams, compute_pixel_cost
from stereo_vision_tpu.stereo.banded import (
    aggregate_banded_scan,
    banded_cost_volume,
    banded_stats_scan,
)
from stereo_vision_tpu.stereo.sgbm import wta_scan
from stereo_vision_tpu.stereo.banded_pallas import (
    aligned_box_packed,
    banded_pixel_cost_pack,
    banded_reduce_pack,
    banded_stats_pack,
)
from stereo_vision_tpu.stereo.hier import HierParams


def _rand_scene(P, H, W, D, seed=0):
    rng = np.random.default_rng(seed)
    left = rng.integers(0, 255, (P, H, W)).astype(np.int32)
    right = np.roll(left, -9, axis=2) + rng.integers(-3, 4, (P, H, W))
    right = np.clip(right, 0, 255).astype(np.int32)
    return jnp.asarray(left), jnp.asarray(right)


def _rand_shift_map(P, H, W, D, B, G, seed=1, tile=8, tile_x=None):
    """Tile-constant (tile x tile_x) random shift maps on the G grid."""
    rng = np.random.default_rng(seed)
    tx = tile if tile_x is None else tile_x
    Ht, Wt = -(-H // tile), -(-W // tx)
    vals = rng.integers(0, (D - B) // G + 1, (P, Ht, Wt)) * G
    s = np.repeat(np.repeat(vals, tile, axis=1), tx, axis=2)[:, :H, :W]
    return jnp.asarray(s.astype(np.int32))


P, K, D, G = 4, 32, 64, 16
H, W = 24, 128
PARAMS = StereoSGBMParams(num_disparities=D, block_size=5, uniqueness_ratio=10)


class TestPixelCostPack:
    def test_exact_vs_reference(self):
        left, right = _rand_scene(P, H, W, D)
        s = _rand_shift_map(P, H, W, D, K, G)

        s_ext = jnp.pad(s, ((0, 0), (0, 0), (1, 1)), mode="edge")
        pix = np.asarray(
            banded_pixel_cost_pack(
                left, right, s_ext,
                ndisp=D, band=K, granularity=G, ftzero=PARAMS.ftzero,
                interpret=True,
            )
        )
        kk = jnp.arange(K)
        for b in range(P):
            full = compute_pixel_cost(left[b], right[b], PARAMS)
            ref = np.asarray(
                jnp.take_along_axis(
                    full.astype(jnp.int32), s[b][..., None] + kk[None, None], -1
                )
            )
            got = pix[:, :, K * 0 :][:, :, :]  # packed (H, W, 128)
            mine = got[:, :, P * np.arange(K) + b]
            np.testing.assert_array_equal(mine, ref, err_msg=f"frame {b}")


class TestAlignedBoxPack:
    def test_exact_vs_reference(self):
        left, right = _rand_scene(P, H, W, D, seed=2)
        s = _rand_shift_map(P, H, W, D, K, G, seed=3)

        s_ext = jnp.pad(s, ((0, 0), (0, 0), (1, 1)), mode="edge")
        pix = banded_pixel_cost_pack(
            left, right, s_ext,
            ndisp=D, band=K, granularity=G, ftzero=PARAMS.ftzero,
            interpret=True,
        )
        C = np.asarray(aligned_box_packed(pix, s, K, G, PARAMS.block_size, interpret=True))
        for b in range(P):
            ref = np.asarray(
                banded_cost_volume(left[b], right[b], s[b], PARAMS, K, G)
            )
            mine = C[:, :, P * np.arange(K) + b]
            np.testing.assert_array_equal(mine, ref, err_msg=f"frame {b}")


class TestReducePack:
    @pytest.mark.parametrize("num_paths", [2, 3, 4, 8])
    def test_exact_vs_scan(self, num_paths):
        left, right = _rand_scene(P, H, W, D, seed=4)
        s = _rand_shift_map(P, H, W, D, K, G, seed=5)
        params = PARAMS._replace(num_paths=num_paths)
        # Build the banded cost with the packed path's own (verified)
        # cost machinery, then compare aggregation+WTA.
        Cs = [
            banded_cost_volume(left[b], right[b], s[b], params, K, G)
            for b in range(P)
        ]
        Cp = jnp.zeros((H, W, 128), jnp.int32)
        for b in range(P):
            Cp = Cp.at[:, :, P * jnp.arange(K) + b].set(Cs[b])
        outs = banded_reduce_pack(
            Cp.astype(jnp.int16), s, K, G, params.P1, params.P2,
            params.uniqueness_ratio, num_paths=num_paths, interpret=True,
        )
        for b in range(P):
            S = aggregate_banded_scan(Cs[b], s[b], G, params.P1, params.P2, num_paths)
            ref = wta_scan(S, K, params.uniqueness_ratio)
            names = ["minS", "best", "sm", "s0", "sp", "uok"]
            for name, mine, want in zip(names, outs, ref):
                got = np.asarray(mine[b])
                wantb = np.asarray(want)
                if name == "uok":
                    got = got > 0.5
                np.testing.assert_array_equal(
                    got.astype(np.float64), wantb.astype(np.float64),
                    err_msg=f"frame {b} stat {name} paths={num_paths}",
                )


class TestStatsPackEndToEnd:
    def test_exact_vs_scan(self):
        left, right = _rand_scene(P, H, W, D, seed=6)
        s = _rand_shift_map(P, H, W, D, K, G, seed=7)
        params = PARAMS._replace(uniqueness_ratio=10, num_paths=8)
        min_x = D
        outs = banded_stats_pack(
            left, right, s, params, K, G, min_x, interpret=True
        )
        for b in range(P):
            ref = banded_stats_scan(left[b], right[b], s[b], params, K, G, min_x)
            for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )

    def test_sub_stats_vs_scan(self):
        """The round-3n 4-stat form (subpixel parabola finished in the
        WTA kernel via compare-accumulate division) must match the scan
        reference's subpixel_disp16 bit-for-bit."""
        left, right = _rand_scene(P, H, W, D, seed=16)
        s = _rand_shift_map(P, H, W, D, K, G, seed=17)
        params = PARAMS._replace(uniqueness_ratio=10, num_paths=8)
        min_x = D
        outs = banded_stats_pack(
            left, right, s, params, K, G, min_x, sub=True, interpret=True
        )
        assert len(outs) == 4
        for b in range(P):
            ref = banded_stats_scan(
                left[b], right[b], s[b], params, K, G, min_x, sub=True
            )
            for i, name in enumerate(["minS", "best", "sub16", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )


class TestHierBatch:
    def test_batch_matches_single_frame(self):
        """stereo_sgbm_hier_batch (packed kernels end-to-end, incl. the
        packed coarse pass) must reproduce per-frame stereo_sgbm_hier
        (scan backend) bit-for-bit."""
        from stereo_vision_tpu.stereo.hier import (
            stereo_sgbm_hier,
            stereo_sgbm_hier_batch,
        )

        Hh, Wh = 48, 192
        left, right = _rand_scene(P, Hh, Wh, 128, seed=8)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
        )
        hp = HierParams()
        batch = np.asarray(
            stereo_sgbm_hier_batch(left, right, params, hp, interpret=True)
        )
        for b in range(P):
            single = np.asarray(stereo_sgbm_hier(left[b], right[b], params, hp))
            np.testing.assert_array_equal(batch[b], single, err_msg=f"frame {b}")

    def test_pack8_band16_matches_single_frame(self):
        """The HIER_FAST preset packs 8 frames (band 16) and runs the
        coarse pass in TWO 4-frame sub-packs (Dc=32 fills only 128/32
        lanes) — both must still reproduce per-frame results exactly."""
        from stereo_vision_tpu.stereo.hier import (
            HIER_FAST,
            stereo_sgbm_hier,
            stereo_sgbm_hier_batch,
        )

        Hh, Wh = 48, 192
        left, right = _rand_scene(8, Hh, Wh, 128, seed=9)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=4,
        )
        batch = np.asarray(
            stereo_sgbm_hier_batch(left, right, params, HIER_FAST, interpret=True)
        )
        for b in range(8):
            single = np.asarray(
                stereo_sgbm_hier(left[b], right[b], params, HIER_FAST)
            )
            np.testing.assert_array_equal(batch[b], single, err_msg=f"frame {b}")

    def test_pack16_band8_two_level_matches_single_frame(self):
        """The round-4 HIER8_FAST preset packs 16 frames (band 8) behind
        a TWO-LEVEL prior: 4 coarse sub-packs (Dc=32), 2 mid sub-packs
        (band 16 at 1/2 res) with the clamp-artifact splice, then the
        16-frame band-8 full-res pass — all must reproduce per-frame
        stereo_sgbm_hier (scan backend) bit-for-bit."""
        from stereo_vision_tpu.stereo.hier import (
            HIER8_FAST,
            stereo_sgbm_hier,
            stereo_sgbm_hier_batch,
        )

        Hh, Wh = 48, 192
        left, right = _rand_scene(16, Hh, Wh, 128, seed=13)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        batch = np.asarray(
            stereo_sgbm_hier_batch(left, right, params, HIER8_FAST, interpret=True)
        )
        for b in range(16):
            single = np.asarray(
                stereo_sgbm_hier(left[b], right[b], params, HIER8_FAST)
            )
            np.testing.assert_array_equal(batch[b], single, err_msg=f"frame {b}")

    def test_pack32_band4_matches_single_frame(self):
        """The round-5 HIER4_FAST preset packs 32 frames (band 4, G=1,
        4-stat WTA — REQUIRED at P=32, see hier._wta_sub) behind the
        two-level prior: 8 coarse sub-packs (Dc=32), 2 mid sub-packs
        (band 8 at 1/2 res), then the 32-frame band-4 full-res pass —
        all must reproduce per-frame stereo_sgbm_hier bit-for-bit."""
        from stereo_vision_tpu.stereo.hier import (
            HIER4_FAST,
            stereo_sgbm_hier,
            stereo_sgbm_hier_batch,
        )

        Hh, Wh = 48, 192
        left, right = _rand_scene(32, Hh, Wh, 128, seed=17)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        batch = np.asarray(
            stereo_sgbm_hier_batch(left, right, params, HIER4_FAST, interpret=True)
        )
        for b in range(0, 32, 3):  # 11 of the 32 frames
            single = np.asarray(
                stereo_sgbm_hier(left[b], right[b], params, HIER4_FAST)
            )
            np.testing.assert_array_equal(batch[b], single, err_msg=f"frame {b}")

    def test_coarse_seam_stack_exact(self, monkeypatch):
        """The round-5 seam-stacked coarse (ONE banded_stats_pack call
        for all P frames, segments separated by marker-shift pad rows)
        must be bit-identical to the per-sub-pack loop — including at a
        geometry with 8 segments (HIER4_FAST: P=32, pack_c=4) and both
        seam paddings (bot=4 via Hc%8==4 here; the pack16 test's
        default-on runs cover nseg=4)."""
        from stereo_vision_tpu.stereo import hier
        from stereo_vision_tpu.stereo.hier import HIER4_FAST, hier_batch_prior

        Hh, Wh = 48, 192  # Hc = 12: top=8, bot=4, Hseg=24, nseg=8
        left, right = _rand_scene(32, Hh, Wh, 128, seed=29)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        monkeypatch.setattr(hier, "_COARSE_SEAM_STACK", True)
        stacked = np.asarray(
            hier_batch_prior(left, right, params, HIER4_FAST, True)[0]
        )
        monkeypatch.setattr(hier, "_COARSE_SEAM_STACK", False)
        looped = np.asarray(
            hier_batch_prior(left, right, params, HIER4_FAST, True)[0]
        )
        np.testing.assert_array_equal(stacked, looped)

    def test_mid_seam_stack_exact(self, monkeypatch):
        """The round-5 seam-stacked MID level (nonzero shift map:
        pix/box/assemble take the stacked s, the aggregation takes
        s + 2G pad markers) must be bit-identical to the per-sub-pack
        loop. HIER4_FAST geometry: P=32, pack_m=16, 2 segments."""
        from stereo_vision_tpu.stereo import hier
        from stereo_vision_tpu.stereo.hier import HIER4_FAST, hier_batch_prior

        Hh, Wh = 48, 192  # Hm = 24: top=8, bot=8, Hseg=40, nseg=2
        left, right = _rand_scene(32, Hh, Wh, 128, seed=31)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        monkeypatch.setattr(hier, "_MID_SEAM_STACK", True)
        stacked = np.asarray(
            hier_batch_prior(left, right, params, HIER4_FAST, True)[1]
        )
        monkeypatch.setattr(hier, "_MID_SEAM_STACK", False)
        looped = np.asarray(
            hier_batch_prior(left, right, params, HIER4_FAST, True)[1]
        )
        np.testing.assert_array_equal(stacked, looped)

    def test_two_level_pyramid_matches_single_frame(self):
        """The generalized mid_levels chain (two intermediate levels,
        1/8 coarse) must stay bit-exact batch-vs-scan. This CONFIG is
        quality-rejected for the bench (hier_ab_r4g_agreement.py: the
        1/8 coarse loses jump structure) — the machinery stays exact for
        deeper-range configs, and this pins the multi-level loop in
        both paths."""
        from stereo_vision_tpu.stereo.hier import (
            HIER8_FAST,
            MidLevel,
            stereo_sgbm_hier,
            stereo_sgbm_hier_batch,
        )

        hp = HIER8_FAST._replace(
            coarse_factor=8,
            mid_levels=(
                MidLevel(4, 16, 8, tile=2, margin=4.0, local_window=1, paths=2),
                MidLevel(2, 8, 4, tile=2, margin=2.5, local_window=1, paths=2),
            ),
        )
        Hh, Wh = 48, 192
        left, right = _rand_scene(16, Hh, Wh, 128, seed=23)
        params = StereoSGBMParams(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        batch = np.asarray(
            stereo_sgbm_hier_batch(left, right, params, hp, interpret=True)
        )
        for b in range(0, 16, 5):  # spot-check 4 of the 16 frames
            single = np.asarray(stereo_sgbm_hier(left[b], right[b], params, hp))
            np.testing.assert_array_equal(batch[b], single, err_msg=f"frame {b}")

    def test_pallas_band8_packed_lr_matches_scan(self, monkeypatch):
        """The TPU band-8 assemble (4-stat WTA + backend 'pallas') now
        feeds lr_fail_pallas_packed directly (pack + d16, floor/ceil
        in-kernel) — must be bit-identical to the scan assemble."""
        import functools as ft

        import stereo_vision_tpu.stereo.lr_pallas as lp
        from stereo_vision_tpu.stereo.hier import (
            HIER8_FAST,
            stereo_sgbm_hier_batch,
        )

        for name in ("lr_fail_pallas", "lr_fail_pallas_packed"):
            monkeypatch.setattr(
                lp, name, ft.partial(getattr(lp, name).__wrapped__, interpret=True)
            )
        Hh, Wh = 48, 192
        left, right = _rand_scene(16, Hh, Wh, 128, seed=29)
        base = dict(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        got = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="pallas", **base),
            HIER8_FAST, interpret=True,
        ))
        want = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="scan", **base),
            HIER8_FAST, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)

    def test_pallas_rowstack_assemble_matches_scan(self, monkeypatch):
        """The TPU default assemble (backend 'pallas' + row-stacked LR —
        ONE lr_fail_pallas dispatch over the (P*H, Wv) maps, hier_ab_r3k)
        must be bit-identical to the per-frame scan assemble. Forces the
        pallas branch on CPU via backend='pallas' with the LR kernel in
        interpret mode (the test_lr_pallas pattern)."""
        import functools as ft

        import stereo_vision_tpu.stereo.lr_pallas as lp
        from stereo_vision_tpu.stereo import hier
        from stereo_vision_tpu.stereo.hier import (
            HIER_FAST,
            stereo_sgbm_hier_batch,
        )

        monkeypatch.setattr(
            lp, "lr_fail_pallas",
            ft.partial(lp.lr_fail_pallas.__wrapped__, interpret=True),
        )
        # Pin the row-stacked 6-stat assemble (the TPU default; the
        # gated-off round-3m fused path has its own test below).
        monkeypatch.setattr(hier, "_FUSED_STATS", False)
        Hh, Wh = 48, 192
        left, right = _rand_scene(8, Hh, Wh, 128, seed=9)
        base = dict(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=3,
        )
        got = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="pallas", **base),
            HIER_FAST, interpret=True,
        ))
        want = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="scan", **base),
            HIER_FAST, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)
        assert hier._PACK_ASSEMBLE is False  # scan arm stayed per-frame

    @pytest.mark.parametrize("num_paths", [3, 4])
    def test_fused_wta_assemble_matches_scan(self, num_paths, monkeypatch):
        """The round-3m fused path (band 16 + backend 'pallas': WTA
        emits pack/disp16+uok int32 in-kernel — subpixel C-division via
        compare-accumulates, MXU shift broadcast — and the packed LR
        kernel derives floor/ceil from disp16) must be bit-identical to
        the per-frame scan assemble. Gated OFF by default (on-chip A/B
        measured 204 -> 160 Mpx/s, see hier._FUSED_STATS); this test
        keeps the capability exact."""
        from stereo_vision_tpu.stereo import hier
        from stereo_vision_tpu.stereo.hier import (
            HIER_FAST,
            stereo_sgbm_hier_batch,
        )

        monkeypatch.setattr(hier, "_FUSED_STATS", True)
        Hh, Wh = 48, 192
        left, right = _rand_scene(8, Hh, Wh, 128, seed=21)
        base = dict(
            num_disparities=128, block_size=5, uniqueness_ratio=10,
            disp12_max_diff=1, speckle_window_size=30, speckle_range=2,
            num_paths=num_paths,
        )
        got = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="pallas", **base),
            HIER_FAST, interpret=True,
        ))
        want = np.asarray(stereo_sgbm_hier_batch(
            left, right, StereoSGBMParams(backend="scan", **base),
            HIER_FAST, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)


class TestFusedSubpixelDivision:
    def test_compare_count_division_exhaustive(self):
        """The fused WTA kernel computes cv2's subpixel C-division
        trunc(((sm-sp)*16 + denom2) / (2*denom2)) with 8 compare-
        accumulates on |num| (quotient is in [-8, 8]). Exhaustive check
        of the formula against true C division over denom2 1..96 and the
        FULL reachable num range [-15*denom2, 17*denom2]."""
        for denom2 in range(1, 97):
            num = np.arange(-15 * denom2, 17 * denom2 + 1, dtype=np.int64)
            den = 2 * denom2
            want = np.sign(num) * (np.abs(num) // den)  # C trunc division
            qa = np.zeros_like(num)
            for c in range(1, 9):
                qa += (np.abs(num) >= c * den).astype(np.int64)
            got = np.where(num < 0, -qa, qa)
            np.testing.assert_array_equal(got, want, err_msg=f"denom2={denom2}")


class TestTile4Realign:
    """The reduce kernels re-align carries at shift-map tile boundaries.
    With 4-px tiles (HIER_FAST: tile=1, f=4) that boundary falls MID
    8-row/8-col block — regression for the r3 bug where those updates
    ran unaligned (surfaced as batch != single on a coarse prior with a
    0->80 vertical jump at row 16; tests had only used 8-px tiles)."""

    def test_stats_exact_vs_scan_tile4(self):
        P4, K4, G4 = 8, 16, 8
        Hh, Wh = 32, 192
        left, right = _rand_scene(P4, Hh, Wh, 128, seed=12)
        s = _rand_shift_map(P4, Hh, Wh, 128, K4, G4, seed=13, tile=4)
        params = PARAMS._replace(num_disparities=128, num_paths=4)
        outs = banded_stats_pack(
            left, right, s, params, K4, G4, min_x=128, tile_px=4,
            interpret=True,
        )
        for b in range(P4):
            ref = banded_stats_scan(left[b], right[b], s[b], params, K4, G4, 128)
            for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )

    def test_stats_exact_vs_scan_asymmetric_8row_4col(self):
        """Asymmetric tiles (8-row x 4-col, e.g. coarse_fx=f/2 with
        tile=1) run at tile_px=4: the extra mid-block ROW realign sees a
        zero delta and must be an exact no-op while the 4-px COLUMN
        boundaries get their required mid realign (hier.py min rule)."""
        P4, K4, G4 = 8, 16, 8
        Hh, Wh = 32, 192
        left, right = _rand_scene(P4, Hh, Wh, 128, seed=21)
        s = _rand_shift_map(P4, Hh, Wh, 128, K4, G4, seed=22, tile=8, tile_x=4)
        params = PARAMS._replace(num_disparities=128, num_paths=4)
        outs = banded_stats_pack(
            left, right, s, params, K4, G4, min_x=128, tile_px=4,
            interpret=True,
        )
        for b in range(P4):
            ref = banded_stats_scan(left[b], right[b], s[b], params, K4, G4, 128)
            for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )

    def test_stats_exact_vs_scan_tile4_8path(self):
        P4, K4, G4 = 8, 16, 8
        Hh, Wh = 24, 192
        left, right = _rand_scene(P4, Hh, Wh, 128, seed=14)
        s = _rand_shift_map(P4, Hh, Wh, 128, K4, G4, seed=15, tile=4)
        params = PARAMS._replace(num_disparities=128, num_paths=8)
        outs = banded_stats_pack(
            left, right, s, params, K4, G4, min_x=128, tile_px=4,
            interpret=True,
        )
        for b in range(P4):
            ref = banded_stats_scan(left[b], right[b], s[b], params, K4, G4, 128)
            for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )


class TestStridedSearch:
    """Disparity-stride search (hier coarse_stride): lane k means
    disparity stride*k. Pallas pack must equal the scan reference."""

    def test_strided_stats_exact_vs_scan(self):
        P8, K8, G8, stride = 8, 16, 8, 2
        Hh, Wh = 24, 128
        left, right = _rand_scene(P8, Hh, Wh, 32, seed=16)
        s = jnp.zeros((P8, Hh, Wh), jnp.int32)  # coarse-style: s = 0
        params = PARAMS._replace(num_disparities=32, num_paths=4)
        outs = banded_stats_pack(
            left, right, s, params, K8, G8, min_x=32, stride=stride,
            interpret=True,
        )
        for b in range(P8):
            ref = banded_stats_scan(
                left[b], right[b], s[b], params, K8, G8, 32, stride=stride
            )
            for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
                np.testing.assert_array_equal(
                    np.asarray(outs[i][b]).astype(np.float64),
                    np.asarray(ref[i]).astype(np.float64),
                    err_msg=f"frame {b} stat {name}",
                )

    def test_strided_cost_matches_subsampled_full(self):
        """banded_cost_volume(stride=2, s=0) == full cost at even
        disparities (the scan oracle underlying the test above)."""
        from stereo_vision_tpu.stereo.sgbm import compute_cost_volume

        left, right = _rand_scene(1, 24, 96, 32, seed=17)
        params = PARAMS._replace(num_disparities=32)
        s = jnp.zeros((24, 96), jnp.int32)
        got = np.asarray(
            banded_cost_volume(left[0], right[0], s, params, 16, 8, stride=2)
        )
        full = np.asarray(compute_cost_volume(left[0], right[0], params))
        np.testing.assert_array_equal(got, full[:, :, ::2])


class TestBoxInKernelDeltas:
    def test_both_delta_paths_identical(self, monkeypatch):
        """The in-kernel-deltas box kernel (5 s-row specs) must match the
        precomputed-d_ref kernel bit-for-bit (both stay available; the
        toggle picks the measured-faster one)."""
        from stereo_vision_tpu.stereo import banded_pallas

        left, right = _rand_scene(P, H, W, D, seed=22)
        s = _rand_shift_map(P, H, W, D, K, G, seed=23, tile=4)
        s_ext = jnp.pad(s, ((0, 0), (0, 0), (1, 1)), mode="edge")
        pix = banded_pixel_cost_pack(
            left, right, s_ext,
            ndisp=D, band=K, granularity=G, ftzero=PARAMS.ftzero,
            interpret=True,
        )
        outs = {}
        for flag in (False, True):
            monkeypatch.setattr(banded_pallas, "_BOX_INKERNEL_DELTAS", flag)
            aligned_box_packed.clear_cache()
            outs[flag] = np.asarray(
                aligned_box_packed(pix, s, K, G, PARAMS.block_size, interpret=True)
            )
        aligned_box_packed.clear_cache()
        np.testing.assert_array_equal(outs[True], outs[False])


class TestVolInt16:
    def test_vol_int16_store_exact(self, monkeypatch):
        """_VOL_INT16 gated variant (measured slower on-chip, kept as a
        tested capability): int16 direction-volume stores must leave the
        stats bit-identical to the default f32 volumes."""
        from stereo_vision_tpu.stereo import banded_pallas

        left, right = _rand_scene(P, H, W, D, seed=18)
        s = _rand_shift_map(P, H, W, D, K, G, seed=19)
        base = banded_stats_pack(left, right, s, PARAMS, K, G, min_x=D, interpret=True)
        monkeypatch.setattr(banded_pallas, "_VOL_INT16", True)
        banded_pallas.banded_reduce_pack.clear_cache()
        got = banded_stats_pack(left, right, s, PARAMS, K, G, min_x=D, interpret=True)
        banded_pallas.banded_reduce_pack.clear_cache()
        for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
            np.testing.assert_array_equal(
                np.asarray(got[i]), np.asarray(base[i]), err_msg=name
            )


class TestValidTrim:
    def test_trim_on_off_identical(self, monkeypatch):
        """The valid-region trim (pix emits x >= min_x - 8, box crops to
        min_x in-kernel) is output-invariant: stats must be bit-identical
        with the trim disabled (full-width kernels + XLA slice)."""
        from stereo_vision_tpu.stereo import banded_pallas

        left, right = _rand_scene(P, H, W, D, seed=30)
        s = _rand_shift_map(P, H, W, D, K, G, seed=31)
        outs = {}
        for flag in (False, True):
            monkeypatch.setattr(banded_pallas, "_TRIM_VALID", flag)
            banded_pallas.banded_pixel_cost_pack.clear_cache()
            banded_pallas.aligned_box_packed.clear_cache()
            outs[flag] = banded_stats_pack(
                left, right, s, PARAMS, K, G, min_x=D, interpret=True
            )
        banded_pallas.banded_pixel_cost_pack.clear_cache()
        banded_pallas.aligned_box_packed.clear_cache()
        for i, name in enumerate(["minS", "best", "sm", "s0", "sp", "uok"]):
            np.testing.assert_array_equal(
                np.asarray(outs[True][i]), np.asarray(outs[False][i]),
                err_msg=name,
            )


class TestDownsamplePack:
    @pytest.mark.parametrize("f", [2, 4, 8])
    def test_exact_vs_matmul_form(self, f):
        """Fused Pallas box downsample vs hier._downsample_box (incl. the
        half-to-even rounding and the trailing W % f column drop)."""
        from stereo_vision_tpu.stereo.banded_pallas import downsample_box_pack
        from stereo_vision_tpu.stereo.hier import _downsample_box

        rng = np.random.default_rng(40 + f)
        img = jnp.asarray(rng.integers(0, 256, (4, 48, 96 + f)).astype(np.int32))
        got = np.asarray(downsample_box_pack(img, f, interpret=True))
        ref = np.asarray(_downsample_box(img, f))
        np.testing.assert_array_equal(got, ref)
