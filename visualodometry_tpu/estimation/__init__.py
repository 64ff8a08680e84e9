"""Robust geometric estimation: vectorized RANSAC solvers.

TPU-native replacements for the reference's OpenCV RANSAC calls
(`cv2.findEssentialMat` at src/modules/vo.py:87-94, `cv2.recoverPose` at
vo.py:96, `cv2.solvePnPRansac` at vo.py:135-141). RANSAC here is never a
data-dependent loop: all hypotheses are generated in one batch, all are
scored against all correspondences at once on the MXU/VPU, and the winner is
an argmax — so the entire estimator compiles into a single XLA program.
"""

from visualodometry_tpu.estimation.essential import (  # noqa: F401
    estimate_essential_ransac,
    recover_pose,
)
from visualodometry_tpu.estimation.pnp import solve_pnp_ransac  # noqa: F401
