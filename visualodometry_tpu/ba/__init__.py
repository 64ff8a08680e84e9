"""Sliding-window bundle adjustment: damped Gauss-Newton + Schur complement.

The reference has NO bundle adjustment (pyceres/pycolmap are declared but
never imported — SURVEY.md §1 L0, reference: pyproject.toml:11-14). This
layer implements the north-star BA: fixed-shape landmark x keyframe
observation grids, analytic reprojection Jacobians, landmark-block Schur
elimination (batched 3x3 inverses), and a dense reduced pose system small
enough to solve directly. The distributed variant shards the landmark
blocks across devices and reduces the pose system with psum
(parallel/distributed_ba.py).
"""

from visualodometry_tpu.ba.solver import BAProblem, ba_solve  # noqa: F401
from visualodometry_tpu.ba.window import assemble_window  # noqa: F401
