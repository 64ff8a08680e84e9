"""Geometry core: SO(3)/SE(3), pinhole camera, batched triangulation.

Pure jnp, jit- and vmap-friendly, float32 by default. These replace the
reference's OpenCV calls `cv2.Rodrigues` (reference: src/modules/vo.py:144,159),
`cv2.projectPoints` (src/modules/frontend.py:139), and
`cv2.triangulatePoints` (src/modules/frontend.py:130) with closed-form,
batched, TPU-compilable equivalents.
"""

from visualodometry_tpu.geometry.so3 import (  # noqa: F401
    so3_exp,
    so3_hat,
    so3_log,
)
from visualodometry_tpu.geometry.se3 import (  # noqa: F401
    se3_inverse,
    make_T,
)
from visualodometry_tpu.geometry.camera import (  # noqa: F401
    project_points,
    project_points_T,
)
from visualodometry_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_dlt,
    triangulate_points,
)
from visualodometry_tpu.geometry.linalg import (  # noqa: F401
    smallest_eigvec,
    svd3,
)
