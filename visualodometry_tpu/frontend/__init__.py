"""Feature frontend: extraction + matching behind one fixed-shape interface.

TPU re-design of the reference's `FeatureFrontend`
(reference: src/modules/frontend.py:9-112). The dict-of-torch-tensors
contract — keypoints (1, N, 2), descriptors (1, N, D), image_size (1, 2) —
becomes a `Features` NamedTuple of fixed-shape jnp arrays with an explicit
validity mask, so every downstream consumer is mask-aware instead of
shape-dynamic.
"""

from visualodometry_tpu.frontend.interface import Features  # noqa: F401
from visualodometry_tpu.frontend.matcher import match_descriptors  # noqa: F401
