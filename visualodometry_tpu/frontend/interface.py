"""The fixed-shape feature contract shared by all extractors and the core.

Replaces the reference's LightGlue-format dict — keypoints (1, N, 2) float,
descriptors (1, N, D), image_size (1, 2) (reference:
src/modules/frontend.py:69-75) — where N varied per frame. Here N is the
config's padded slot count and `valid` marks live slots, so the VO step
compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Features(NamedTuple):
    """Per-frame features at fixed shape.

    kps:   (N, 2) float32 pixel coordinates (x, y); garbage where ~valid.
    desc:  (N, D) float32 L2-normalized descriptors; zero where ~valid.
    valid: (N,) bool live-slot mask.
    """

    kps: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def num_slots(self) -> int:
        return self.kps.shape[0]


def pad_features(
    kps, desc, num_slots: int, dtype=jnp.float32
) -> Features:
    """Pack variable-count host features into the fixed-shape contract."""
    import numpy as np

    n = min(len(kps), num_slots)
    d = desc.shape[1] if len(desc) else 128
    kps_out = np.zeros((num_slots, 2), dtype=np.float32)
    desc_out = np.zeros((num_slots, d), dtype=np.float32)
    valid = np.zeros(num_slots, dtype=bool)
    kps_out[:n] = kps[:n]
    desc_out[:n] = desc[:n]
    valid[:n] = True
    return Features(
        kps=jnp.asarray(kps_out, dtype),
        desc=jnp.asarray(desc_out, dtype),
        valid=jnp.asarray(valid),
    )
