"""Temporal analytics: pose fusion, smoothing, constraints, kinematics,
joint angles and physical validators.

TPU rebuild of the reference's temporal layer (SURVEY.md §1): time is a
batch axis — Savitzky-Golay and finite-difference kinematics are
convolutions/vectorized diffs over (T, J, 3) pose arrays; only genuinely
sequential carries (EMA landmark filter, velocity-constraint chain,
One-Euro filter) are ``lax.scan``s.
"""

from stereo_vision_tpu.track.joints import (
    KEY_JOINTS,
    JOINT_NAMES,
    JOINT_INDEX,
    NUM_JOINTS,
    LIMB_PAIRS,
    DEFAULT_LIMB_LENGTHS_MM,
    ANGLE_NAMES,
    pose_dict_to_array,
    pose_array_to_dict,
    sequence_to_array,
    sequence_to_dicts,
)
from stereo_vision_tpu.track.smoothing import (
    MotionSmoother,
    PRESET_CONFIGS,
    savgol_coefficients,
    savgol_filter_time,
    moving_average_time,
    one_euro_filter_time,
)
from stereo_vision_tpu.track.constraints import (
    average_limb_lengths,
    apply_anatomical_constraints_sequence,
    apply_velocity_constraints,
    apply_bone_length_constraints,
)
from stereo_vision_tpu.track.kinematics import (
    GRAVITY_MM_S2,
    finite_difference,
    joint_velocities,
    joint_accelerations,
    estimate_gravity,
    detect_start_of_motion,
    theoretical_drop_velocity,
)
from stereo_vision_tpu.track.angles import angle_3d, pose_angles, pose_angles_dict
from stereo_vision_tpu.track.fusion import (
    StereoRig,
    StereoPoseTracker,
    fuse_pose,
    ema_filter,
    extract_key_joints,
)
from stereo_vision_tpu.track.ball import (
    BallTrajectory,
    analyze_ball_drop,
    triangulate_detections,
    drop_report,
)
from stereo_vision_tpu.track.dual_camera import (
    DualCameraResult,
    analyze_dual_camera,
    occlusion_matrix,
)
from stereo_vision_tpu.track.validators import (
    ValidationResult,
    validate_baseline,
    validate_distance,
    validate_length,
    validate_sphere_diameter,
    validate_gravity,
)

__all__ = [
    "KEY_JOINTS",
    "JOINT_NAMES",
    "JOINT_INDEX",
    "NUM_JOINTS",
    "LIMB_PAIRS",
    "DEFAULT_LIMB_LENGTHS_MM",
    "ANGLE_NAMES",
    "pose_dict_to_array",
    "pose_array_to_dict",
    "sequence_to_array",
    "sequence_to_dicts",
    "MotionSmoother",
    "PRESET_CONFIGS",
    "savgol_coefficients",
    "savgol_filter_time",
    "moving_average_time",
    "one_euro_filter_time",
    "average_limb_lengths",
    "apply_anatomical_constraints_sequence",
    "apply_velocity_constraints",
    "apply_bone_length_constraints",
    "GRAVITY_MM_S2",
    "finite_difference",
    "joint_velocities",
    "joint_accelerations",
    "estimate_gravity",
    "detect_start_of_motion",
    "theoretical_drop_velocity",
    "angle_3d",
    "pose_angles",
    "pose_angles_dict",
    "StereoRig",
    "StereoPoseTracker",
    "fuse_pose",
    "ema_filter",
    "extract_key_joints",
    "ValidationResult",
    "validate_baseline",
    "validate_distance",
    "validate_length",
    "validate_sphere_diameter",
    "validate_gravity",
    "BallTrajectory",
    "analyze_ball_drop",
    "triangulate_detections",
    "drop_report",
    "DualCameraResult",
    "analyze_dual_camera",
    "occlusion_matrix",
]
