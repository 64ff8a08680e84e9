"""extract_patches (Pallas DMA kernel) vs a numpy slicing oracle.

The kernel contract (ops/patches.py): packed int32 field (L, H, W),
8-aligned row origins (the caller aligns down and uses a taller patch),
arbitrary column origins (the kernel over-fetches a 128-aligned lane
window and rotates it into place).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from visualodometry_tpu.ops.patches import extract_patches


def _oracle(field, lvl, y0, x0, Py, Px):
    K = lvl.shape[0]
    out = np.zeros((K, Py, Px), field.dtype)
    for k in range(K):
        out[k] = field[lvl[k], y0[k] : y0[k] + Py, x0[k] : x0[k] + Px]
    return out


@pytest.mark.unit
class TestExtractPatches:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        L, H, W = 3, 96, 384
        Py, Px, K = 40, 32, 16
        field = rng.integers(-(2**31), 2**31, (L, H, W)).astype(np.int32)
        lvl = rng.integers(0, L, K).astype(np.int32)
        y0 = (rng.integers(0, (H - Py) // 8 + 1, K) * 8).astype(np.int32)
        x0 = rng.integers(0, W - Px + 1, K).astype(np.int32)
        got = extract_patches(
            jnp.asarray(field), lvl, y0, x0,
            patch_y=Py, patch_x=Px, group=8, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got), _oracle(field, lvl, y0, x0, Py, Px)
        )

    def test_border_origins(self):
        """Extremes: x0 = 0 and x0 = W - Px (wide-window clamp path)."""
        rng = np.random.default_rng(1)
        L, H, W = 2, 72, 256
        Py, Px, K = 72, 64, 8
        field = rng.integers(-(2**31), 2**31, (L, H, W)).astype(np.int32)
        lvl = np.zeros(K, np.int32)
        y0 = np.zeros(K, np.int32)  # only valid origin when H == Py
        x0 = np.array([0, W - Px, 1, W - Px - 1, 64, 127, 128, 129],
                      np.int32)
        got = extract_patches(
            jnp.asarray(field), lvl, y0, x0,
            patch_y=Py, patch_x=Px, group=8, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got), _oracle(field, lvl, y0, x0, Py, Px)
        )
