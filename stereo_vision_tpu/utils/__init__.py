"""Shared utilities."""

from stereo_vision_tpu.utils.precision import highest_precision

__all__ = ["highest_precision"]
