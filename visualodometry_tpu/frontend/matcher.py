"""Descriptor matching: batched L2 kNN (k=2) + Lowe ratio test.

Replaces `cv2.BFMatcher(NORM_L2).knnMatch(k=2)` + the per-match Python
ratio loop (reference: src/modules/frontend.py:34,100-111). The O(N^2)
distance matrix is a single MXU matmul (||a-b||^2 = |a|^2 + |b|^2 - 2ab);
top-2 and the ratio test are masked reductions. The match list contract
changes from a compacted (M, 2) int array (reference:
src/modules/frontend.py:111) to a fixed-shape per-query representation:
`match_idx[i] = j` with a validity mask — no compaction, no dynamic shapes.

A fused Pallas kernel (ops/match_pallas.py) provides the same interface
without materializing the N^2 matrix in HBM; this jnp version is the
reference implementation and CPU path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (N0,) int32 — index into frame-1 slots per query
    valid: jnp.ndarray  # (N0,) bool — passed validity + ratio (+ mutual)


# Python float, NOT jnp.float32(...): a module-level device constant
# would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (must run before any backend touch —
# parallel/runtime.py).
_BIG = 1e30


def _top2_jnp(desc0, desc1, valid1):
    """Reference path: full distance matrix + masked reductions."""
    sq0 = jnp.sum(desc0 * desc0, axis=1)  # (N0,)
    sq1 = jnp.sum(desc1 * desc1, axis=1)  # (N1,)
    cross = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
    d2 = sq0[:, None] + sq1[None, :] - 2.0 * cross  # (N0, N1)
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(valid1[None, :], d2, _BIG)

    best_idx = jnp.argmin(d2, axis=1)  # (N0,)
    best_d2 = jnp.take_along_axis(d2, best_idx[:, None], axis=1)[:, 0]
    d2_wo_best = d2.at[jnp.arange(d2.shape[0]), best_idx].set(_BIG)
    second_d2 = jnp.min(d2_wo_best, axis=1)
    return best_d2, second_d2, best_idx.astype(jnp.int32)


def _use_pallas(n0: int, n1: int, d: int) -> bool:
    import jax

    return (
        jax.default_backend() == "tpu"
        and n0 % 256 == 0
        and n1 % 128 == 0
        and d % 128 == 0
    )


def match_descriptors(
    desc0: jnp.ndarray,
    valid0: jnp.ndarray,
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    ratio: float = 0.75,
    mutual: bool = False,
    backend: str = "auto",
) -> MatchResult:
    """kNN(k=2) + Lowe ratio over padded descriptor sets.

    desc0: (N0, D) queries (keyframe), desc1: (N1, D) train (current).
    Distances are squared-L2; the ratio test compares against ratio^2,
    which is exactly OpenCV's `m.distance < ratio * n.distance` on L2.

    backend: "auto" uses the fused Pallas kernel on TPU when shapes tile
    cleanly (ops/match_pallas.py — the distance matrix never touches HBM),
    else the jnp path; "jnp" / "pallas" force a path.
    """
    n0, d = desc0.shape
    n1 = desc1.shape[0]
    use_pallas = backend == "pallas" or (
        backend == "auto" and _use_pallas(n0, n1, d)
    )
    if use_pallas:
        from visualodometry_tpu.ops.match_pallas import match_top2_pallas

        best_d2, second_d2, best_idx = match_top2_pallas(desc0, desc1, valid1)
    else:
        best_d2, second_d2, best_idx = _top2_jnp(desc0, desc1, valid1)

    r2 = jnp.float32(ratio * ratio)
    ok = valid0 & (best_d2 < r2 * second_d2) & (best_d2 < _BIG)

    if mutual:
        # column-direction best via a swapped second pass (cheap relative
        # to the row pass; shares the same kernel)
        if use_pallas:
            from visualodometry_tpu.ops.match_pallas import match_top2_pallas

            _, _, best_col_of_row = match_top2_pallas(desc1, desc0, valid0)
            ok = ok & (best_col_of_row[best_idx] == jnp.arange(n0))
        else:
            sq0 = jnp.sum(desc0 * desc0, axis=1)
            sq1 = jnp.sum(desc1 * desc1, axis=1)
            cross = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
            d2 = sq0[:, None] + sq1[None, :] - 2.0 * cross
            d2_col = jnp.where(valid0[:, None], d2, _BIG)
            best_col = jnp.argmin(d2_col, axis=0)  # (N1,)
            ok = ok & (best_col[best_idx] == jnp.arange(n0))

    return MatchResult(idx=best_idx, valid=ok)
