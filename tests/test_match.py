"""Matcher tests: jnp path vs brute-force numpy, Pallas kernel equivalence."""

import numpy as np
import jax.numpy as jnp

from visualodometry_tpu.frontend.matcher import match_descriptors
from visualodometry_tpu.ops.match_pallas import match_top2_pallas


def _random_sets(rng, n0=256, n1=256, d=128, n_pairs=100):
    """Two descriptor sets with n_pairs planted correspondences."""
    base = rng.normal(size=(n_pairs, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    d0 = rng.normal(size=(n0, d)).astype(np.float32)
    d1 = rng.normal(size=(n1, d)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d0[:n_pairs] = base + 0.02 * rng.normal(size=(n_pairs, d))
    d1[:n_pairs] = base + 0.02 * rng.normal(size=(n_pairs, d))
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    return d0, d1


class TestMatcherJnp:
    def test_matches_brute_force(self, rng):
        d0, d1 = _random_sets(rng)
        valid0 = np.ones(256, bool)
        valid1 = np.ones(256, bool)
        res = match_descriptors(
            jnp.asarray(d0), jnp.asarray(valid0), jnp.asarray(d1),
            jnp.asarray(valid1), ratio=0.75, backend="jnp",
        )
        # brute force with numpy, reproducing OpenCV knn+ratio semantics
        d2 = ((d0[:, None, :] - d1[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1)
        bf_idx = order[:, 0]
        bf_ok = d2[np.arange(256), order[:, 0]] < 0.75**2 * d2[
            np.arange(256), order[:, 1]
        ]
        np.testing.assert_array_equal(np.asarray(res.valid), bf_ok)
        np.testing.assert_array_equal(np.asarray(res.idx)[bf_ok], bf_idx[bf_ok])
        # planted pairs dominate the accepted matches
        ok = np.asarray(res.valid)
        assert ok[:100].mean() > 0.95
        assert (np.asarray(res.idx)[:100] == np.arange(100))[ok[:100]].all()

    def test_invalid_slots_never_matched(self, rng):
        d0, d1 = _random_sets(rng)
        valid0 = np.ones(256, bool)
        valid0[:10] = False
        valid1 = np.ones(256, bool)
        valid1[:50] = False  # includes planted train twins 0..49
        res = match_descriptors(
            jnp.asarray(d0), jnp.asarray(valid0), jnp.asarray(d1),
            jnp.asarray(valid1), backend="jnp",
        )
        assert not np.asarray(res.valid)[:10].any()
        assert not np.isin(np.asarray(res.idx)[np.asarray(res.valid)],
                           np.arange(50)).any()

    def test_mutual_check(self, rng):
        d0, d1 = _random_sets(rng)
        valid = np.ones(256, bool)
        res = match_descriptors(
            jnp.asarray(d0), jnp.asarray(valid), jnp.asarray(d1),
            jnp.asarray(valid), mutual=True, backend="jnp",
        )
        idx = np.asarray(res.idx)
        ok = np.asarray(res.valid)
        # every surviving match must be the column-wise best too
        d2 = ((d0[:, None, :] - d1[None, :, :]) ** 2).sum(-1)
        col_best = d2.argmin(axis=0)
        assert (col_best[idx[ok]] == np.flatnonzero(ok)).all()


class TestMatcherPallas:
    def test_interpret_matches_spec(self, rng):
        """Kernel vs a jnp implementation of ITS spec: bf16 descriptor
        products with f32 accumulation and f32 norms (the kernel's MXU
        configuration — one pass instead of the f32 multi-pass; distance
        perturbation ~1e-3 relative is below what the Lowe ratio test
        resolves, e2e ATE measured unchanged). The reference jnp
        matcher path stays full-f32; this test pins the kernel to its
        own exact specification so any indexing/reduction bug still
        trips the equality asserts."""
        d0, d1 = _random_sets(rng)
        valid1 = np.ones(256, bool)
        valid1[200:] = False
        b_p, s_p, i_p = match_top2_pallas(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(valid1),
            interpret=True,
        )
        # the kernel's spec, in jnp
        d0j = jnp.asarray(d0)
        d1j = jnp.asarray(d1)
        sq0 = jnp.sum(d0j * d0j, axis=1, keepdims=True)
        sq1 = jnp.where(jnp.asarray(valid1), jnp.sum(d1j * d1j, axis=1), 1e30)
        cross = jnp.matmul(
            d0j.astype(jnp.bfloat16), d1j.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(sq0 + sq1[None, :] - 2.0 * cross, 0.0)
        i_j = jnp.argmin(d2, axis=1)
        b_j = jnp.take_along_axis(d2, i_j[:, None], axis=1)[:, 0]
        s_j = jnp.min(
            d2.at[jnp.arange(d2.shape[0]), i_j].set(1e30), axis=1
        )
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_j))
        np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_j), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_j), atol=1e-5)
