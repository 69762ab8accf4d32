"""orbslam2_dualcam_tpu — a TPU-native dual-camera visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lixiny/ORB-SLAM2-DualCam (reference surveyed in /root/repo/SURVEY.md):

* ORB pyramid extraction (FAST + orientation + BRIEF) as batched, fixed-shape
  device kernels (reference: src/ORBextractor.cc).
* Descriptor matching as MXU matmuls over bit-sign embeddings instead of
  scalar Hamming loops (reference: src/ORBmatcher.cc).
* Bundle adjustment (pose-only / local / global) as batched Levenberg-
  Marquardt with landmark Schur elimination, including the dual-camera
  extrinsic-adjoint reprojection factor (reference:
  Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp:103-247).
* DBoW2-style place recognition: k-means descriptor-tree quantization on
  device, per-camera inverted files on host (reference:
  src/KeyFrameDatabase.cc:56-73).
* The four-stage dual-camera bootstrap: mono init -> cross-camera
  relocalization -> second-map creation + metric rescale -> global BA
  (reference: src/Tracking.cc:512-1033).
* Multi-chip scaling of global BA via jax.sharding Mesh + shard_map with
  psum-reduced Schur systems (no reference equivalent: the reference is a
  single-process pthread design).

Host Python orchestrates the state machine and graph bookkeeping; every hot
numeric path is a jitted, statically-shaped JAX program.
"""

__version__ = "0.1.0"

from orbslam2_dualcam_tpu.utils.config import (  # noqa: F401
    CameraConfig,
    OrbConfig,
    MatcherConfig,
    TrackerConfig,
    SystemConfig,
)
