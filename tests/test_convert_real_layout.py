"""Converter fidelity vs the REAL ultralytics yolov8n state_dict layout.

tests/test_convert.py roundtrips through our own inverse mapping
(`flax_tree_to_fake_state_dict`), which is circular: a key-naming bug
present in both directions would cancel out. This fixture instead
hand-encodes the ultralytics v8 detection-model state_dict — every key
name and tensor shape of ``yolov8n.pt`` — straight from the public
architecture (ultralytics yolov8.yaml: depth 0.33 / width 0.25 /
ratio 2.0; reference consumption site: ball_drop.py:817-823), with no
import from stereo_vision_tpu.models.convert. The test then proves:

1. `convert_ultralytics_state_dict` consumes exactly this key set
   (modulo the documented ignores: `num_batches_tracked` counters and
   `model.22.dfl.conv.weight`, whose fixed softmax-expectation weights
   our decode computes directly).
2. The converted tree is structurally identical (paths + shapes) to
   `YOLOv8(variant="n").init`'s variables.
3. Conv kernels land transposed (O,I,kh,kw) -> (kh,kw,I,O) and BN
   running stats land in batch_stats, value-checked on spot keys.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stereo_vision_tpu.models import YOLOv8  # noqa: E402
from stereo_vision_tpu.models.convert import convert_ultralytics_state_dict  # noqa: E402


def _conv_bn(out: dict, prefix: str, co: int, ci: int, k: int) -> None:
    """ultralytics Conv = Conv2d(bias=False) + BatchNorm2d (+SiLU)."""
    out[f"{prefix}.conv.weight"] = (co, ci, k, k)
    out[f"{prefix}.bn.weight"] = (co,)
    out[f"{prefix}.bn.bias"] = (co,)
    out[f"{prefix}.bn.running_mean"] = (co,)
    out[f"{prefix}.bn.running_var"] = (co,)
    out[f"{prefix}.bn.num_batches_tracked"] = ()


def _c2f(out: dict, idx: int, c1: int, c2: int, n: int) -> None:
    """C2f(c1, c2, n): hidden c = c2 // 2; cv1 1x1 -> 2c, n Bottlenecks
    (two 3x3 convs at width c), cv2 1x1 over the (2 + n) * c concat."""
    c = c2 // 2
    _conv_bn(out, f"model.{idx}.cv1", 2 * c, c1, 1)
    _conv_bn(out, f"model.{idx}.cv2", c2, (2 + n) * c, 1)
    for m in range(n):
        _conv_bn(out, f"model.{idx}.m.{m}.cv1", c, c, 3)
        _conv_bn(out, f"model.{idx}.m.{m}.cv2", c, c, 3)


def yolov8n_state_dict_shapes() -> dict:
    """Key -> shape of ultralytics ``YOLO('yolov8n.pt').model.state_dict()``.

    Hand-derived from the public v8 yaml at width 0.25 (stage channels
    16/32/64/128/256), depth 0.33 (C2f repeats 1/2/2/1, neck 1).
    """
    out: dict = {}
    # Backbone.
    _conv_bn(out, "model.0", 16, 3, 3)      # P1/2 stem
    _conv_bn(out, "model.1", 32, 16, 3)     # P2/4
    _c2f(out, 2, 32, 32, 1)
    _conv_bn(out, "model.3", 64, 32, 3)     # P3/8
    _c2f(out, 4, 64, 64, 2)
    _conv_bn(out, "model.5", 128, 64, 3)    # P4/16
    _c2f(out, 6, 128, 128, 2)
    _conv_bn(out, "model.7", 256, 128, 3)   # P5/32
    _c2f(out, 8, 256, 256, 1)
    _conv_bn(out, "model.9.cv1", 128, 256, 1)   # SPPF
    _conv_bn(out, "model.9.cv2", 256, 512, 1)
    # Neck (10 Upsample / 11 Concat have no parameters).
    _c2f(out, 12, 384, 128, 1)
    _c2f(out, 15, 192, 64, 1)
    _conv_bn(out, "model.16", 64, 64, 3)
    _c2f(out, 18, 192, 128, 1)
    _conv_bn(out, "model.19", 128, 128, 3)
    _c2f(out, 21, 384, 256, 1)
    # Detect head, nc=80, ch=(64, 128, 256), reg_max=16:
    # c2 = max(16, ch[0] // 4, 4 * reg_max) = 64, c3 = max(ch[0], 80) = 80.
    for s, ch in enumerate((64, 128, 256)):
        _conv_bn(out, f"model.22.cv2.{s}.0", 64, ch, 3)
        _conv_bn(out, f"model.22.cv2.{s}.1", 64, 64, 3)
        out[f"model.22.cv2.{s}.2.weight"] = (64, 64, 1, 1)
        out[f"model.22.cv2.{s}.2.bias"] = (64,)
        _conv_bn(out, f"model.22.cv3.{s}.0", 80, ch, 3)
        _conv_bn(out, f"model.22.cv3.{s}.1", 80, 80, 3)
        out[f"model.22.cv3.{s}.2.weight"] = (80, 80, 1, 1)
        out[f"model.22.cv3.{s}.2.bias"] = (80,)
    out["model.22.dfl.conv.weight"] = (1, 16, 1, 1)
    return out


IGNORED_SUFFIXES = ("num_batches_tracked",)
IGNORED_KEYS = {"model.22.dfl.conv.weight"}


class _TrackingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed: set = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        self.accessed.add(k)
        return super().__contains__(k)


@pytest.fixture(scope="module")
def converted():
    shapes = yolov8n_state_dict_shapes()
    rng = np.random.default_rng(7)
    def val(k, s):
        if not s:
            return np.int64(42)
        v = rng.standard_normal(s).astype(np.float32)
        return np.abs(v) + 0.1 if k.endswith("running_var") else v

    sd = _TrackingDict({k: val(k, s) for k, s in shapes.items()})
    tree = convert_ultralytics_state_dict(sd, variant="n")
    return sd, tree


def test_every_real_key_consumed(converted):
    sd, _ = converted
    expected = {
        k for k in sd
        if not k.endswith(IGNORED_SUFFIXES) and k not in IGNORED_KEYS
    }
    missing = expected - sd.accessed
    assert not missing, f"converter never read {sorted(missing)[:8]} ..."


def test_tree_matches_model_init(converted):
    _, tree = converted
    model = YOLOv8(num_classes=80, variant="n")
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ref_shapes = {
        str(p): v.shape for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_shapes = {
        str(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    assert ref_shapes == got_shapes


def test_spot_value_mapping(converted):
    sd, tree = converted
    # Stem conv kernel: (16, 3, 3, 3) -> (3, 3, 3, 16).
    np.testing.assert_array_equal(
        tree["params"]["ConvBnSiLU_0"]["Conv_0"]["kernel"],
        np.asarray(sd["model.0.conv.weight"]).transpose(2, 3, 1, 0),
    )
    # BN running stats of the first C2f bottleneck land in batch_stats.
    np.testing.assert_array_equal(
        tree["batch_stats"]["C2f_0"]["Bottleneck_0"]["ConvBnSiLU_0"]["BatchNorm_0"]["mean"],
        sd["model.2.m.0.cv1.bn.running_mean"],
    )
    # Detect box-tower output 1x1 conv keeps its bias.
    np.testing.assert_array_equal(
        tree["params"]["Conv_0"]["bias"], sd["model.22.cv2.0.2.bias"]
    )


def test_forward_runs_with_converted_tree(converted):
    _, tree = converted
    model = YOLOv8(num_classes=80, variant="n")
    out = model.apply(jax.tree.map(jnp.asarray, tree), jnp.zeros((1, 64, 64, 3)), train=False)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in jax.tree.leaves(out))
