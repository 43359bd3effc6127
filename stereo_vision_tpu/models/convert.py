"""Ultralytics YOLOv8 checkpoint -> flax parameter conversion.

The reference ships a trained ``yolov8m.pt`` (gitignored; see
/root/reference/.MISSING_LARGE_BLOBS) and calls ultralytics at runtime
(reference: ball_drop.py:817-823). This module maps an ultralytics
detection-model ``state_dict`` onto the flax YOLOv8 in
stereo_vision_tpu.models.yolov8 so those checkpoints run TPU-native.

Layout facts encoded here (public ultralytics v8 detection yaml):
  model.0..9   backbone (Conv, Conv, C2f, Conv, C2f, Conv, C2f, Conv,
               C2f, SPPF)
  model.10..21 neck (Upsample, Concat, C2f, Upsample, Concat, C2f,
               Conv, Concat, C2f, Conv, Concat, C2f)
  model.22     Detect: cv2.{s} = box tower (Conv, Conv, Conv2d),
               cv3.{s} = cls tower, dfl (fixed expectation weights —
               not needed; decode_predictions computes the softmax
               expectation directly).

Tensor transforms: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O);
BatchNorm {weight, bias, running_mean, running_var} -> flax
{scale, bias} + batch_stats {mean, var}.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


class _TreeBuilder:
    def __init__(self):
        self.params: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}

    def _set(self, root: dict, path: list[str], leaf_key: str, value: np.ndarray):
        d = root
        for k in path:
            d = d.setdefault(k, {})
        d[leaf_key] = value

    def conv_bn(self, flax_path: list[str], sd: Mapping[str, Any], torch_prefix: str):
        """An ultralytics Conv (conv + bn) onto a ConvBnSiLU module."""
        self._set(self.params, flax_path + ["Conv_0"], "kernel", _conv_w(sd[f"{torch_prefix}.conv.weight"]))
        bn = flax_path + ["BatchNorm_0"]
        self._set(self.params, bn, "scale", np.asarray(sd[f"{torch_prefix}.bn.weight"]))
        self._set(self.params, bn, "bias", np.asarray(sd[f"{torch_prefix}.bn.bias"]))
        self._set(self.stats, bn, "mean", np.asarray(sd[f"{torch_prefix}.bn.running_mean"]))
        self._set(self.stats, bn, "var", np.asarray(sd[f"{torch_prefix}.bn.running_var"]))

    def plain_conv(self, flax_path: list[str], sd: Mapping[str, Any], torch_prefix: str):
        self._set(self.params, flax_path, "kernel", _conv_w(sd[f"{torch_prefix}.weight"]))
        if f"{torch_prefix}.bias" in sd:
            self._set(self.params, flax_path, "bias", np.asarray(sd[f"{torch_prefix}.bias"]))

    def c2f(self, flax_name: str, sd: Mapping[str, Any], idx: int, n: int):
        self.conv_bn([flax_name, "ConvBnSiLU_0"], sd, f"model.{idx}.cv1")
        for m in range(n):
            for cv, sub in (("cv1", "ConvBnSiLU_0"), ("cv2", "ConvBnSiLU_1")):
                self.conv_bn([flax_name, f"Bottleneck_{m}", sub], sd, f"model.{idx}.m.{m}.{cv}")
        self.conv_bn([flax_name, "ConvBnSiLU_1"], sd, f"model.{idx}.cv2")


def convert_ultralytics_state_dict(
    state_dict: Mapping[str, Any], variant: str = "m"
) -> dict[str, Any]:
    """Map an ultralytics YOLOv8 detection state_dict to flax variables.

    Args:
      state_dict: torch ``model.state_dict()`` of an ultralytics
        DetectionModel (keys ``model.N...``), values tensors/ndarrays.
      variant: n/s/m/l/x (sets the C2f repeat counts).

    Returns:
      {"params": ..., "batch_stats": ...} matching
      YOLOv8(variant=...).init's tree.
    """
    from stereo_vision_tpu.models.yolov8 import VARIANTS

    d, _, _ = VARIANTS[variant]
    n1 = max(round(3 * d), 1)
    n2 = max(round(6 * d), 1)

    b = _TreeBuilder()
    sd = state_dict

    # Backbone: module index -> (flax name, kind)
    b.conv_bn(["ConvBnSiLU_0"], sd, "model.0")
    b.conv_bn(["ConvBnSiLU_1"], sd, "model.1")
    b.c2f("C2f_0", sd, 2, n1)
    b.conv_bn(["ConvBnSiLU_2"], sd, "model.3")
    b.c2f("C2f_1", sd, 4, n2)
    b.conv_bn(["ConvBnSiLU_3"], sd, "model.5")
    b.c2f("C2f_2", sd, 6, n2)
    b.conv_bn(["ConvBnSiLU_4"], sd, "model.7")
    b.c2f("C2f_3", sd, 8, n1)
    b.conv_bn(["SPPF_0", "ConvBnSiLU_0"], sd, "model.9.cv1")
    b.conv_bn(["SPPF_0", "ConvBnSiLU_1"], sd, "model.9.cv2")

    # Neck
    b.c2f("C2f_4", sd, 12, n1)   # P5 up + P4
    b.c2f("C2f_5", sd, 15, n1)   # P4 up + P3 -> o3
    b.conv_bn(["ConvBnSiLU_5"], sd, "model.16")
    b.c2f("C2f_6", sd, 18, n1)   # -> o4
    b.conv_bn(["ConvBnSiLU_6"], sd, "model.19")
    b.c2f("C2f_7", sd, 21, n1)   # -> o5

    # Detect head: per scale s, flax names continue in call order.
    for s in range(3):
        cbs = 7 + 4 * s
        b.conv_bn([f"ConvBnSiLU_{cbs}"], sd, f"model.22.cv2.{s}.0")
        b.conv_bn([f"ConvBnSiLU_{cbs + 1}"], sd, f"model.22.cv2.{s}.1")
        b.plain_conv([f"Conv_{2 * s}"], sd, f"model.22.cv2.{s}.2")
        b.conv_bn([f"ConvBnSiLU_{cbs + 2}"], sd, f"model.22.cv3.{s}.0")
        b.conv_bn([f"ConvBnSiLU_{cbs + 3}"], sd, f"model.22.cv3.{s}.1")
        b.plain_conv([f"Conv_{2 * s + 1}"], sd, f"model.22.cv3.{s}.2")

    return {"params": b.params, "batch_stats": b.stats}


def load_ultralytics_checkpoint(path: str, variant: str = "m") -> dict[str, Any]:
    """Load a .pt checkpoint (ultralytics save format) and convert.

    Uses torch (CPU) only for deserialization.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_ultralytics_state_dict(sd, variant)


def flax_tree_to_fake_state_dict(variables: dict[str, Any], variant: str = "m") -> dict[str, np.ndarray]:
    """Inverse mapping for tests: synthesize an ultralytics-layout
    state_dict whose tensors are the (re-transposed) flax leaves, so
    convert_ultralytics_state_dict(result) must reproduce ``variables``
    exactly. Exercises every key path without needing a real .pt file."""
    out: dict[str, np.ndarray] = {}

    def walk_to(path: list[str], tree):
        d = tree
        for k in path:
            d = d[k]
        return d

    def emit_conv_bn(flax_path, torch_prefix):
        conv = walk_to(flax_path + ["Conv_0"], variables["params"])
        out[f"{torch_prefix}.conv.weight"] = np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
        bn_p = walk_to(flax_path + ["BatchNorm_0"], variables["params"])
        bn_s = walk_to(flax_path + ["BatchNorm_0"], variables["batch_stats"])
        out[f"{torch_prefix}.bn.weight"] = np.asarray(bn_p["scale"])
        out[f"{torch_prefix}.bn.bias"] = np.asarray(bn_p["bias"])
        out[f"{torch_prefix}.bn.running_mean"] = np.asarray(bn_s["mean"])
        out[f"{torch_prefix}.bn.running_var"] = np.asarray(bn_s["var"])

    def emit_plain(flax_path, torch_prefix):
        conv = walk_to(flax_path, variables["params"])
        out[f"{torch_prefix}.weight"] = np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in conv:
            out[f"{torch_prefix}.bias"] = np.asarray(conv["bias"])

    def emit_c2f(name, idx, n):
        emit_conv_bn([name, "ConvBnSiLU_0"], f"model.{idx}.cv1")
        for m in range(n):
            emit_conv_bn([name, f"Bottleneck_{m}", "ConvBnSiLU_0"], f"model.{idx}.m.{m}.cv1")
            emit_conv_bn([name, f"Bottleneck_{m}", "ConvBnSiLU_1"], f"model.{idx}.m.{m}.cv2")
        emit_conv_bn([name, "ConvBnSiLU_1"], f"model.{idx}.cv2")

    from stereo_vision_tpu.models.yolov8 import VARIANTS

    d, _, _ = VARIANTS[variant]
    n1 = max(round(3 * d), 1)
    n2 = max(round(6 * d), 1)

    emit_conv_bn(["ConvBnSiLU_0"], "model.0")
    emit_conv_bn(["ConvBnSiLU_1"], "model.1")
    emit_c2f("C2f_0", 2, n1)
    emit_conv_bn(["ConvBnSiLU_2"], "model.3")
    emit_c2f("C2f_1", 4, n2)
    emit_conv_bn(["ConvBnSiLU_3"], "model.5")
    emit_c2f("C2f_2", 6, n2)
    emit_conv_bn(["ConvBnSiLU_4"], "model.7")
    emit_c2f("C2f_3", 8, n1)
    emit_conv_bn(["SPPF_0", "ConvBnSiLU_0"], "model.9.cv1")
    emit_conv_bn(["SPPF_0", "ConvBnSiLU_1"], "model.9.cv2")
    emit_c2f("C2f_4", 12, n1)
    emit_c2f("C2f_5", 15, n1)
    emit_conv_bn(["ConvBnSiLU_5"], "model.16")
    emit_c2f("C2f_6", 18, n1)
    emit_conv_bn(["ConvBnSiLU_6"], "model.19")
    emit_c2f("C2f_7", 21, n1)
    for s in range(3):
        cbs = 7 + 4 * s
        emit_conv_bn([f"ConvBnSiLU_{cbs}"], f"model.22.cv2.{s}.0")
        emit_conv_bn([f"ConvBnSiLU_{cbs + 1}"], f"model.22.cv2.{s}.1")
        emit_plain([f"Conv_{2 * s}"], f"model.22.cv2.{s}.2")
        emit_conv_bn([f"ConvBnSiLU_{cbs + 2}"], f"model.22.cv3.{s}.0")
        emit_conv_bn([f"ConvBnSiLU_{cbs + 3}"], f"model.22.cv3.{s}.1")
        emit_plain([f"Conv_{2 * s + 1}"], f"model.22.cv3.{s}.2")
    return out
