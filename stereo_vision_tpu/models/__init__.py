"""Neural detectors in flax: YOLOv8-class object detector and a
33-landmark pose net, batched left+right in one jit graph (SURVEY.md §7.6).
"""

from stereo_vision_tpu.models.layers import ConvBnSiLU, Bottleneck, C2f, SPPF
from stereo_vision_tpu.models.yolov8 import (
    YOLOv8,
    VARIANTS,
    STRIDES,
    REG_MAX,
    anchor_points,
    decode_predictions,
    detect,
    nms,
    Detections,
    detection_loss,
)
from stereo_vision_tpu.models.convert import (
    convert_ultralytics_state_dict,
    load_ultralytics_checkpoint,
)
from stereo_vision_tpu.models.train import (
    TrainState,
    make_train_step,
    shard_variables,
    put_batch,
)
from stereo_vision_tpu.models.pose import (
    PoseNet,
    NUM_LANDMARKS,
    pose_loss,
    landmarks_to_pixels,
)

__all__ = [
    "ConvBnSiLU",
    "Bottleneck",
    "C2f",
    "SPPF",
    "YOLOv8",
    "VARIANTS",
    "STRIDES",
    "REG_MAX",
    "anchor_points",
    "decode_predictions",
    "detect",
    "nms",
    "Detections",
    "detection_loss",
    "PoseNet",
    "NUM_LANDMARKS",
    "pose_loss",
    "landmarks_to_pixels",
    "convert_ultralytics_state_dict",
    "load_ultralytics_checkpoint",
    "TrainState",
    "make_train_step",
    "shard_variables",
    "put_batch",
]
