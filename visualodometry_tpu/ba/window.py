"""Assemble a fixed-shape BA problem from a window of keyframes.

Given stacked keyframe arrays (poses, keypoints, per-keypoint landmark
ids — the same layout the VO core's `Keyframe` uses, stacked over a window
axis), build the dense (L, P) observation grid: the landmark set is the
(up to L) landmarks observed in the newest keyframe, and each grid cell is
located by an id-equality match against every keyframe's id array — one
batched comparison, no per-landmark loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from visualodometry_tpu.ba.solver import BAProblem
from visualodometry_tpu.core.state import MapState, landmark_lookup


def assemble_window(
    kf_T_wc: jnp.ndarray,  # (P, 4, 4) world-from-camera per keyframe
    kf_kps: jnp.ndarray,  # (P, N, 2)
    kf_ids: jnp.ndarray,  # (P, N) landmark ids, -1 = none
    kf_valid: jnp.ndarray,  # (P, N)
    map_state: MapState,
    K: jnp.ndarray,
    num_landmarks: int,
) -> tuple[BAProblem, jnp.ndarray]:
    """Returns (problem, chosen_ids (L,) with -1 padding).

    Poses are converted to camera-from-world inside the problem.
    """
    from visualodometry_tpu.geometry.se3 import se3_inverse

    L = num_landmarks
    newest_ids = kf_ids[-1]
    sel = (newest_ids >= 0) & kf_valid[-1]
    order = jnp.argsort(~sel, stable=True)
    chosen = jnp.where(sel[order], newest_ids[order], -1)[:L]  # (L,)

    pts, live = landmark_lookup(map_state, chosen)
    chosen = jnp.where(live, chosen, -1)

    # locate each chosen id in each keyframe's id array
    eq = (chosen[:, None, None] == kf_ids[None, :, :]) & kf_valid[None, :, :]
    # (L, P, N) — at most one hit per (l, p) since ids are unique per frame
    slot = jnp.argmax(eq, axis=2)  # (L, P)
    found = jnp.any(eq, axis=2)  # (L, P)
    P = kf_kps.shape[0]
    uv = kf_kps[jnp.arange(P)[None, :], slot]  # (L, P, 2)
    mask = found & (chosen >= 0)[:, None]

    T_cw = se3_inverse(kf_T_wc)
    return BAProblem(T_cw=T_cw, X=pts, uv=uv, mask=mask, K=K), chosen


def write_back(
    map_state: MapState, chosen_ids: jnp.ndarray, X_refined: jnp.ndarray
) -> MapState:
    """Scatter refined landmark positions back into the ring-buffer map."""
    m = map_state.ids.shape[0]
    ok = chosen_ids >= 0
    slots = jnp.where(ok, chosen_ids % m, m)  # m -> dropped
    # only update slots that still hold the same id (not evicted meanwhile)
    still = ok & (map_state.ids[jnp.where(ok, chosen_ids % m, 0)] == chosen_ids)
    slots = jnp.where(still, slots, m)
    points = map_state.points.at[slots].set(X_refined, mode="drop")
    return map_state._replace(points=points)
