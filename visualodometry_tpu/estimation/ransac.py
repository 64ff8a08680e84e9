"""Shared machinery for batched (loop-free) RANSAC.

The classic RANSAC loop "sample → solve → score → repeat until confident"
is replaced by "sample H minimal sets at once → solve H models in a batch →
score all H×N residuals in one matmul-shaped pass → argmax inliers". H is
chosen from the standard RANSAC iteration bound at the config's confidence
(e.g. 0.999 over 8-point samples at 50% outliers needs ~1177 iterations;
512-1024 hypotheses cover the operating points of this pipeline) — but the
shape stays static regardless of the data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_valid_indices(
    key: jax.Array, valid: jnp.ndarray, num_hypotheses: int, sample_size: int
) -> jnp.ndarray:
    """Sample (H, k) indices of `True` entries of `valid`, with replacement.

    Fixed-shape: invalid-entry indices are packed to the front via a stable
    argsort on ~valid, and random draws are taken modulo the valid count.
    When nothing is valid, returns zeros (callers gate on the count).
    """
    n = valid.shape[0]
    order = jnp.argsort(~valid, stable=True)  # valid indices first
    count = jnp.sum(valid).astype(jnp.int32)
    count_safe = jnp.maximum(count, 1)
    draws = jax.random.randint(
        key, (num_hypotheses, sample_size), 0, jnp.iinfo(jnp.int32).max,
        dtype=jnp.int32,
    )
    j = draws % count_safe
    return order[j]


def best_hypothesis(inlier_counts: jnp.ndarray) -> jnp.ndarray:
    """Index of the hypothesis with the most inliers (ties → lowest index)."""
    return jnp.argmax(inlier_counts)
