"""Aux subsystems: detection cache, frame mapper, checkpointing."""

import numpy as np

from stereo_vision_tpu.detect.cache import DetectionCache, image_hash
from stereo_vision_tpu.sync.mapper import StereoFrameMapper


class TestDetectionCache:
    def test_memoization_and_persistence(self, tmp_path, rng):
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        calls = []

        def detector(im):
            calls.append(1)
            return {"cx": 1.0}

        cache = DetectionCache(tmp_path / "det.pkl")
        f = cache.cached(detector)
        assert f(img) == {"cx": 1.0}
        assert f(img) == {"cx": 1.0}
        assert len(calls) == 1  # second call was cached
        cache.save()
        cache2 = DetectionCache(tmp_path / "det.pkl")
        assert cache2.get(img) == {"cx": 1.0}

    def test_hash_distinguishes(self, rng):
        a = rng.integers(0, 255, (4, 4)).astype(np.uint8)
        b = a.copy(); b[0, 0] ^= 1
        assert image_hash(a) != image_hash(b)


class TestFrameMapper:
    def test_mapping_and_range(self):
        m = StereoFrameMapper(offset=7, left_count=100, right_count=100)
        assert m.left_to_right(0) == 7
        assert m.right_to_left(7) == 0
        assert m.left_to_right(95) is None  # right would be 102
        start, stop = m.valid_range()
        assert start == 0 and stop == 93
        pairs = list(m.pairs())
        assert pairs[0] == (0, 7) and pairs[-1] == (92, 99)

    def test_negative_offset(self):
        m = StereoFrameMapper(offset=-5, left_count=50, right_count=50)
        assert m.left_to_right(2) is None
        assert m.left_to_right(5) == 0
        start, _ = m.valid_range()
        assert start == 5

    def test_roundtrip(self, tmp_path):
        m = StereoFrameMapper(3, 10, 20)
        m.save(tmp_path / "sync.json")
        m2 = StereoFrameMapper.load(tmp_path / "sync.json")
        assert m2.offset == 3 and m2.right_count == 20


def test_numpy_tree_checkpoint(tmp_path):
    import jax.numpy as jnp
    from stereo_vision_tpu.models.checkpoint import save_numpy_tree

    tree = {"params": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
    save_numpy_tree(tmp_path / "ckpt.npz", tree)
    loaded = np.load(tmp_path / "ckpt.npz")
    assert len(loaded.files) == 2
