"""TPU-native monocular visual odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (cteufel13/VisualOdometry, surveyed in SURVEY.md): feature
extraction, descriptor matching, RANSAC essential-matrix bootstrapping, PnP
tracking with speed-scale smoothing, landmark triangulation into a bounded
slot map, sliding-window bundle adjustment, and multi-device scaling via
`jax.sharding` meshes.

Design principles (TPU-first, not a port):
- every variable-size set (keypoints, matches, inliers, landmarks) is a
  fixed-shape padded array + validity mask, so the whole per-frame pipeline
  is one XLA program;
- RANSAC is "generate all hypotheses in a batch, score all at once, argmax",
  never a data-dependent loop;
- the landmark map is a fixed-capacity ring buffer whose eviction semantics
  match the reference's age-based pruning (reference: src/modules/vo.py:35-47);
- matrices are kept on the MXU: descriptor distances are matmuls, linear
  solves are batched eigh/LU.
"""

__version__ = "0.1.0"

from visualodometry_tpu.config import VOConfig, get_config  # noqa: F401
