"""Fixed-shape VO state pytrees and the ring-buffer landmark map.

State inventory mirrors the reference's `VisualOdometry.__init__`
(reference: src/modules/vo.py:15-29): pose, landmark map, keyframe,
speed-smoothing scalars, initialized flag — all as static-shape arrays.

The landmark map replaces the reference's Python dict + age pruning
(`map_points` / `_prune_map`, reference: src/modules/vo.py:17,35-47) with a
fixed-capacity ring buffer: landmark ids are assigned sequentially and id
`pid` lives in slot `pid % capacity`, so slots are recycled in exact FIFO
order — a landmark is evicted precisely when `capacity` newer landmarks
exist, reproducing the reference's "delete ids < next_id - max_points"
semantics at O(1) shape (capacity 20480 vs the reference's 20000, rounded
to the 128-lane TPU tile).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend.interface import Features


class MapState(NamedTuple):
    points: jnp.ndarray  # (M, 3) float32 landmark positions
    ids: jnp.ndarray  # (M,) int32 landmark id per slot; -1 = empty
    next_id: jnp.ndarray  # () int32 monotonically increasing


class Keyframe(NamedTuple):
    kps: jnp.ndarray  # (N, 2) float32
    desc: jnp.ndarray  # (N, D) float32
    kp_valid: jnp.ndarray  # (N,) bool
    ids: jnp.ndarray  # (N,) int32 landmark id per keypoint; -1 = none
    T_wc: jnp.ndarray  # (4, 4) float32 world-from-camera


class VOState(NamedTuple):
    frame_id: jnp.ndarray  # () int32
    initialized: jnp.ndarray  # () bool
    has_keyframe: jnp.ndarray  # () bool
    T_wc: jnp.ndarray  # (4, 4) float32 current world-from-camera
    last_pos: jnp.ndarray  # (3,) float32
    baseline_speed: jnp.ndarray  # () float32
    is_turning: jnp.ndarray  # () bool
    keyframe: Keyframe
    map: MapState
    rng_key: jnp.ndarray  # jax PRNG key for the RANSAC samplers


class StepOutput(NamedTuple):
    """Small per-frame outputs for the host (viz / eval / logging)."""

    T_wc: jnp.ndarray  # (4, 4)
    speed: jnp.ndarray  # () float32 — current_speed_for_plot
    baseline_speed: jnp.ndarray  # ()
    initialized: jnp.ndarray  # () bool
    is_keyframe: jnp.ndarray  # () bool
    kf_reason: jnp.ndarray  # () int32: 0 none, 1 median-flow, 2 low-tracking
    did_reset: jnp.ndarray  # () bool
    median_flow: jnp.ndarray  # () float32
    num_tracked: jnp.ndarray  # () int32
    num_matches: jnp.ndarray  # () int32
    curr_ids: jnp.ndarray  # (N,) int32 landmark ids on current keypoints
    match_idx: jnp.ndarray  # (N,) int32 kf->curr match per kf keypoint
    match_valid: jnp.ndarray  # (N,) bool


def init_map(cfg: VOConfig) -> MapState:
    m = cfg.map_capacity
    return MapState(
        points=jnp.zeros((m, 3), jnp.float32),
        ids=jnp.full((m,), -1, jnp.int32),
        next_id=jnp.int32(0),
    )


def empty_keyframe(cfg: VOConfig, desc_dim: int) -> Keyframe:
    n = cfg.padded_keypoints
    return Keyframe(
        kps=jnp.zeros((n, 2), jnp.float32),
        desc=jnp.zeros((n, desc_dim), jnp.float32),
        kp_valid=jnp.zeros((n,), bool),
        ids=jnp.full((n,), -1, jnp.int32),
        T_wc=jnp.eye(4, dtype=jnp.float32),
    )


def init_state(cfg: VOConfig, desc_dim: int, seed: int | None = None) -> VOState:
    import jax

    return VOState(
        frame_id=jnp.int32(0),
        initialized=jnp.asarray(False),
        has_keyframe=jnp.asarray(False),
        T_wc=jnp.eye(4, dtype=jnp.float32),
        last_pos=jnp.zeros(3, jnp.float32),
        baseline_speed=jnp.float32(1.0),
        is_turning=jnp.asarray(False),
        keyframe=empty_keyframe(cfg, desc_dim),
        map=init_map(cfg),
        rng_key=jax.random.key(cfg.seed if seed is None else seed),
    )


def landmark_lookup(
    map_state: MapState, pids: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather landmark positions for an array of ids.

    Returns (points (..., 3), live (...,) bool). A landmark id is live iff
    its ring slot still holds it — the O(1) equivalent of the reference's
    `pid in self.map_points` check (reference: src/modules/vo.py:123).
    """
    m = map_state.ids.shape[0]
    slots = jnp.where(pids >= 0, pids % m, 0)
    live = (pids >= 0) & (map_state.ids[slots] == pids)
    return map_state.points[slots], live


def register_landmarks(
    map_state: MapState, pts3d: jnp.ndarray, valid: jnp.ndarray
) -> tuple[MapState, jnp.ndarray]:
    """Append masked new landmarks, recycling oldest slots (FIFO).

    pts3d: (K, 3); valid: (K,) — invalid entries are dropped. Returns the
    updated map and the per-entry assigned ids ((K,) int32, -1 where
    invalid). Ids are assigned in entry order, like the reference's
    sequential registration loop (reference: src/modules/vo.py:277-284).
    """
    m = map_state.ids.shape[0]
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1  # rank among valid
    new_ids = jnp.where(valid, map_state.next_id + rank, -1)
    slots = jnp.where(valid, new_ids % m, m)  # m = out-of-bounds -> dropped
    points = map_state.points.at[slots].set(pts3d, mode="drop")
    ids = map_state.ids.at[slots].set(new_ids, mode="drop")
    count = jnp.sum(valid.astype(jnp.int32))
    return (
        MapState(points=points, ids=ids, next_id=map_state.next_id + count),
        new_ids,
    )


def features_as_keyframe(
    feats: Features, ids: jnp.ndarray, T_wc: jnp.ndarray
) -> Keyframe:
    return Keyframe(
        kps=feats.kps,
        desc=feats.desc,
        kp_valid=feats.valid,
        ids=ids,
        T_wc=T_wc,
    )
