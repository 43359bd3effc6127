"""Physical ground-truth validators.

The reference's de-facto test suite (SURVEY.md §4): every measurement is
checked against a physically known quantity. This module collects those
checks as reusable functions:

- known baseline distance (reference: extrinsic.py:441-445),
- known object distance (checkerboard_distance.py:152-157,
  calibrate_v4/distance.py:488),
- ruler length, default 12 in = 304.8 mm
  (calibrate_v3/stereo_calibration_workflow.py:916,
  calibrate_v2/ruler_estimation.py:191),
- sphere diameter vs known circumference (archive/auto_validate.py:271),
- square side length (archive/validate.py:221),
- gravity vs 9800 mm/s² (ball_drop.py:479-485; see track.kinematics).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from stereo_vision_tpu.track.kinematics import GRAVITY_MM_S2, estimate_gravity


class ValidationResult(NamedTuple):
    name: str
    measured: float
    expected: float
    error_percent: float
    passed: bool

    @staticmethod
    def make(name: str, measured: float, expected: float, tolerance_percent: float) -> "ValidationResult":
        err = abs(measured - expected) / abs(expected) * 100.0 if expected else float("inf")
        return ValidationResult(name, float(measured), float(expected), err, err <= tolerance_percent)


def validate_baseline(
    T: np.ndarray, actual_distance_mm: float, tolerance_percent: float = 5.0
) -> ValidationResult:
    """‖T‖ vs the measured camera separation (extrinsic.py:441-445)."""
    baseline = float(np.linalg.norm(np.asarray(T)))
    return ValidationResult.make("baseline", baseline, actual_distance_mm, tolerance_percent)


def validate_distance(
    points_3d: np.ndarray, expected_distance_mm: float, tolerance_percent: float = 10.0
) -> ValidationResult:
    """Distance to an object = ‖mean(points3D)‖
    (checkerboard_distance.py:108-109)."""
    d = float(np.linalg.norm(np.asarray(points_3d).reshape(-1, 3).mean(axis=0)))
    return ValidationResult.make("distance", d, expected_distance_mm, tolerance_percent)


def validate_length(
    endpoint_a: np.ndarray,
    endpoint_b: np.ndarray,
    expected_length_mm: float = 304.8,
    tolerance_percent: float = 10.0,
    name: str = "ruler",
) -> ValidationResult:
    """Length between two triangulated endpoints vs a known object
    (ruler: calibrate_v2/ruler_estimation.py:191; square side:
    archive/validate.py:221)."""
    L = float(np.linalg.norm(np.asarray(endpoint_a) - np.asarray(endpoint_b)))
    return ValidationResult.make(name, L, expected_length_mm, tolerance_percent)


def validate_sphere_diameter(
    edge_points_3d: np.ndarray,
    known_circumference_mm: float,
    tolerance_percent: float = 10.0,
) -> ValidationResult:
    """Triangulated sphere diameter vs a known circumference
    (archive/auto_validate.py:271-330): expected diameter = C / pi,
    measured = max pairwise distance among triangulated edge points."""
    pts = np.asarray(edge_points_3d).reshape(-1, 3)
    diff = pts[:, None] - pts[None, :]
    measured = float(np.linalg.norm(diff, axis=-1).max())
    expected = known_circumference_mm / np.pi
    return ValidationResult.make("sphere_diameter", measured, expected, tolerance_percent)


def validate_gravity(
    positions_mm: np.ndarray,
    timestamps_s: np.ndarray,
    tolerance_percent: float = 10.0,
    up_axis: int = 1,
) -> ValidationResult:
    """Measured gravity vs 9800 mm/s² (ball_drop.py:479-485)."""
    g, _ = estimate_gravity(positions_mm, timestamps_s, up_axis=up_axis)
    return ValidationResult.make("gravity", g, GRAVITY_MM_S2, tolerance_percent)
