"""stereo_vision_tpu — a TPU-native stereo-vision / biomechanics framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
jacksonroah/stereo-vision reference (OpenCV-based stereo calibration and 3D
tracking, see /root/repo/SURVEY.md):

- ``ops``      — geometry + image primitives (distortion, Rodrigues, DLT
                 triangulation, Bouguet rectification, remap, filters),
                 all pure jax.numpy / Pallas and fully vmappable.
- ``stereo``   — dense disparity: StereoBM- and StereoSGBM-parity matchers
                 (census/SAD/BT cost volumes, 8-path semi-global aggregation,
                 WTA + subpixel + LR-check + speckle filtering) and
                 disparity→depth via the rectification Q matrix.
- ``calib``    — checkerboard intrinsic/extrinsic calibration as a JAX
                 Levenberg-Marquardt optimization, frame-diversity selection,
                 quality gates.
- ``sync``     — flash-pulse stream synchronization + content-based matching.
- ``track``    — triangulation fusion, anatomical/velocity constraints,
                 Savitzky-Golay smoothing as convolution, kinematics,
                 physical ground-truth validators (gravity, ruler, sphere).
- ``detect``   — image-space detectors (checkerboard corners, Otsu, HSV,
                 Hough circles, circularity rescoring).
- ``models``   — neural detectors (YOLOv8-class object detector, 33-keypoint
                 pose net) in flax, batched left+right in one jit graph.
- ``parallel`` — mesh / sharding definitions; batched multi-stream pipelines
                 over a ``jax.sharding.Mesh`` (data × space axes).
- ``pipeline`` — typed configs, artifact store (reference on-disk schema
                 interop), orchestrated stages with quality gates.
"""

__version__ = "0.1.0"
