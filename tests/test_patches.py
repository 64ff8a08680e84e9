"""extract_patches (Pallas DMA kernel) vs a numpy slicing oracle."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from visualodometry_tpu.ops.patches import extract_patches


@pytest.mark.unit
class TestExtractPatches:
    def _oracle(self, field, lvl, y0, x0, P):
        K = lvl.shape[0]
        out = np.zeros((K, field.shape[1], P, P), field.dtype)
        for k in range(K):
            out[k] = field[lvl[k], :, y0[k] : y0[k] + P, x0[k] : x0[k] + P]
        return out

    @pytest.mark.parametrize("dtype", [np.float32, np.dtype("bfloat16")])
    def test_matches_oracle(self, dtype):
        rng = np.random.default_rng(0)
        L, C, H, W = 3, 2, 96, 200
        P, K = 32, 16
        field = rng.standard_normal((L, C, H, W)).astype(np.float32)
        if dtype != np.float32:
            field = jnp.asarray(field).astype(jnp.bfloat16)
            field_np = np.asarray(field.astype(jnp.float32))
        else:
            field_np = field
        lvl = rng.integers(0, L, K).astype(np.int32)
        y0 = rng.integers(0, H - P + 1, K).astype(np.int32)
        x0 = rng.integers(0, W - P + 1, K).astype(np.int32)
        got = extract_patches(
            jnp.asarray(field), lvl, y0, x0, patch=P, group=8, interpret=True
        )
        want = self._oracle(field_np, lvl, y0, x0, P)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)), want
        )

    def test_border_origins(self):
        rng = np.random.default_rng(1)
        L, C, H, W = 2, 2, 64, 64
        P, K = 64, 8
        field = rng.standard_normal((L, C, H, W)).astype(np.float32)
        lvl = np.zeros(K, np.int32)
        y0 = np.zeros(K, np.int32)  # only valid origin when H == P
        x0 = np.zeros(K, np.int32)
        got = extract_patches(
            jnp.asarray(field), lvl, y0, x0, patch=P, group=8, interpret=True
        )
        want = self._oracle(field, lvl, y0, x0, P)
        np.testing.assert_array_equal(np.asarray(got), want)
