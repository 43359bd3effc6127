"""Hosted-API detector client: cache + color gate + circularity chain.

Rebuilds reference scripts/archive/roboflow_ball_detector.py:161-300 with
a pluggable transport (zero-egress environment: the HTTP call is the only
part stubbed; every gate/refinement stage is the real implementation).
"""

import numpy as np
import pytest

from stereo_vision_tpu.detect.hosted import (
    ROBOFLOW_BLUE_HSV_RANGE,
    HostedDetectorClient,
    local_transport,
)
from stereo_vision_tpu.models.pretrained import BALL_WEIGHTS
from stereo_vision_tpu.synth.scenes import draw_ball, textured_background


def _scene(rng, cx=100.0, cy=80.0, r=30.0, color=(30, 80, 230)):
    img = textured_background(rng, 160, 200)
    draw_ball(img, cx, cy, r, color)
    return img


def _pred(cx, cy, r, conf):
    return {"x": cx, "y": cy, "width": 2 * r, "height": 2 * r, "confidence": conf}


class TestHostedClient:
    def test_color_gate_prefers_blue(self):
        """A higher-confidence off-color box loses to a blue one."""
        rng = np.random.default_rng(0)
        img = _scene(rng, color=(30, 80, 230))  # blue ball at (100, 80)
        draw_ball(img, 40.0, 120.0, 18.0, (230, 60, 40))  # red distractor

        preds = [_pred(40, 120, 18, 0.95), _pred(100, 80, 30, 0.6)]
        client = HostedDetectorClient(lambda im: preds, hsv_range=ROBOFLOW_BLUE_HSV_RANGE)
        det = client.detect(img)
        assert det is not None
        assert np.hypot(det.cx - 100, det.cy - 80) < 6.0

    def test_fallback_to_best_confidence_without_color(self):
        rng = np.random.default_rng(1)
        img = _scene(rng, color=(230, 60, 40))  # red ball only
        preds = [_pred(100, 80, 30, 0.8)]
        client = HostedDetectorClient(lambda im: preds, hsv_range=ROBOFLOW_BLUE_HSV_RANGE)
        det = client.detect(img)
        assert det is not None  # no blue -> falls back to raw best
        assert np.hypot(det.cx - 100, det.cy - 80) < 6.0

    def test_circularity_refinement_tightens_center(self):
        """An offset, oversized box gets pulled back onto the ball."""
        rng = np.random.default_rng(2)
        img = _scene(rng, cx=100, cy=80, r=25, color=(30, 80, 230))
        preds = [_pred(108, 86, 38, 0.9)]  # sloppy box
        client = HostedDetectorClient(lambda im: preds, hsv_range=ROBOFLOW_BLUE_HSV_RANGE)
        det = client.detect(img)
        assert det is not None
        raw_err = np.hypot(108 - 100, 86 - 80)
        ref_err = np.hypot(det.cx - 100, det.cy - 80)
        assert ref_err < raw_err
        assert abs(det.radius - 25) < 6.0

    def test_size_gate_rejects_tiny(self):
        rng = np.random.default_rng(3)
        img = textured_background(rng, 160, 200)  # no ball at all
        preds = [_pred(100, 80, 4, 0.9)]  # radius below the 10px gate
        client = HostedDetectorClient(lambda im: preds)
        assert client.detect(img) is None

    def test_cache_stores_misses(self, tmp_path):
        """No-detection frames must not re-hit the (paid) transport."""
        rng = np.random.default_rng(7)
        img = textured_background(rng, 160, 200)
        client = HostedDetectorClient(lambda im: [], cache_path=tmp_path / "c.pkl")
        assert client.detect(img) is None
        assert client.detect(img) is None
        assert client.calls == 1

    def test_confidence_threshold(self):
        rng = np.random.default_rng(4)
        img = _scene(rng)
        client = HostedDetectorClient(lambda im: [_pred(100, 80, 30, 0.3)])
        assert client.detect(img) is None  # below conf_threshold=0.5

    def test_cache_skips_transport(self, tmp_path):
        rng = np.random.default_rng(5)
        img = _scene(rng)
        client = HostedDetectorClient(
            lambda im: [_pred(100, 80, 30, 0.9)],
            cache_path=tmp_path / "cache.pkl",
        )
        a = client.detect(img)
        b = client.detect(img)
        assert client.calls == 1
        assert a == b
        client.save_cache()
        # A fresh client reloads the persisted cache: zero transport calls.
        client2 = HostedDetectorClient(
            lambda im: (_ for _ in ()).throw(AssertionError("must not call")),
            cache_path=tmp_path / "cache.pkl",
        )
        assert client2.detect(img) == a
        assert client2.calls == 0


@pytest.mark.skipif(not BALL_WEIGHTS.exists(), reason="ball weights not trained")
def test_local_transport_end_to_end():
    """The offline stand-in transport drives the same client chain."""
    rng = np.random.default_rng(6)
    img = textured_background(rng, 240, 320)
    draw_ball(img, 160.0, 120.0, 30.0, (255, 120, 30))  # orange, like training
    from stereo_vision_tpu.detect.ball import ORANGE_HSV_RANGE

    client = HostedDetectorClient(
        local_transport(), conf_threshold=0.3, hsv_range=ORANGE_HSV_RANGE
    )
    det = client.detect(img)
    assert det is not None
    assert np.hypot(det.cx - 160, det.cy - 120) < 8.0
