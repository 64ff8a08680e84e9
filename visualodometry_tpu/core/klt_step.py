"""KLT-tracking VO mode: continuous operation with candidate keypoints.

The reference snapshot matches descriptors between keyframes; the course
project statement it implements (vo_project_statement.pdf §4.1/§4.3,
summarized in SURVEY.md §2.3 N11 and §5.7) actually specifies KLT
tracking with *candidate keypoints*: every feature is tracked frame to
frame; a candidate stores its first observation (pixel + camera pose) and
is triangulated into a landmark once the parallax between the first and
current bearing exceeds a threshold. This module implements that design
as a second fixed-shape jitted step:

- track slots: N fixed keypoint slots with positions, landmark ids
  (-1 = candidate), first-observation pixel + pose;
- correspondence by pyramidal KLT (ops/klt.py) from the stored previous
  frame — no descriptors in the loop;
- PnP on slots with live landmarks; same speed-smoothing and reset
  semantics as the descriptor mode (reference: src/modules/vo.py:150-299);
- candidate promotion: batched bearing-angle parallax test + batched
  two-view DLT between each candidate's own first pose and the current
  pose (per-candidate reference views — a generalization of the keyframe
  pair);
- replenishment: fresh detections fill dead slots, suppressed within a
  radius of live tracks (batched distance test, compaction-free slot
  assignment).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.state import (
    MapState,
    init_map,
    landmark_lookup,
    register_landmarks,
)
from visualodometry_tpu.estimation.essential import (
    estimate_essential_ransac,
    recover_pose,
)
from visualodometry_tpu.estimation.pnp import solve_pnp_ransac
from visualodometry_tpu.frontend.interface import Features
from visualodometry_tpu.geometry.camera import pixels_to_normalized
from visualodometry_tpu.geometry.se3 import make_T, se3_inverse
from visualodometry_tpu.geometry.so3 import rotation_angle
from visualodometry_tpu.ops.klt import klt_track


class KLTState(NamedTuple):
    frame_id: jnp.ndarray
    initialized: jnp.ndarray
    has_tracks: jnp.ndarray
    T_wc: jnp.ndarray  # (4, 4)
    last_pos: jnp.ndarray
    baseline_speed: jnp.ndarray
    is_turning: jnp.ndarray
    image: jnp.ndarray  # (H, W) previous frame
    kps: jnp.ndarray  # (N, 2) current track positions
    ids: jnp.ndarray  # (N,) landmark id, -1 = candidate
    valid: jnp.ndarray  # (N,)
    first_uv: jnp.ndarray  # (N, 2) candidate first observation
    first_T_cw: jnp.ndarray  # (N, 4, 4) pose at first observation
    map: MapState
    rng_key: jnp.ndarray


class KLTStepOutput(NamedTuple):
    T_wc: jnp.ndarray
    speed: jnp.ndarray
    initialized: jnp.ndarray
    did_reset: jnp.ndarray
    num_tracked: jnp.ndarray  # slots tracked by KLT this frame
    num_landmarks: jnp.ndarray  # tracked slots with live landmarks
    num_promoted: jnp.ndarray  # candidates promoted to landmarks
    kps: jnp.ndarray  # (N, 2)
    ids: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)


def init_klt_state(cfg: VOConfig, image_hw: tuple[int, int], seed=None):
    n = cfg.padded_keypoints
    h, w = image_hw
    return KLTState(
        frame_id=jnp.int32(0),
        initialized=jnp.asarray(False),
        has_tracks=jnp.asarray(False),
        T_wc=jnp.eye(4, dtype=jnp.float32),
        last_pos=jnp.zeros(3, jnp.float32),
        baseline_speed=jnp.float32(1.0),
        is_turning=jnp.asarray(False),
        image=jnp.zeros((h, w), jnp.float32),
        kps=jnp.zeros((n, 2), jnp.float32),
        ids=jnp.full((n,), -1, jnp.int32),
        valid=jnp.zeros((n,), bool),
        first_uv=jnp.zeros((n, 2), jnp.float32),
        first_T_cw=jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (n, 4, 4)
        ),
        map=init_map(cfg),
        rng_key=jax.random.key(cfg.seed if seed is None else seed),
    )


def _bearings_world(uv, T_cw, K):
    """Unit bearing rays in world coords. uv: (N, 2); T_cw: (N, 4, 4)."""
    xy = pixels_to_normalized(uv, K)  # (N, 2)
    d_cam = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], axis=-1)
    R_wc = jnp.swapaxes(T_cw[:, :3, :3], -1, -2)
    d_w = jnp.einsum("nij,nj->ni", R_wc, d_cam, precision="highest")
    return d_w / jnp.maximum(
        jnp.linalg.norm(d_w, axis=-1, keepdims=True), 1e-12
    )


def _triangulate_per_view(T_cw1, T_cw2, uv1, uv2, K, cfg):
    """Two-view DLT with PER-CORRESPONDENCE first views.

    T_cw1: (N, 4, 4); T_cw2: (4, 4) shared current pose; uv: (N, 2).
    Returns (pts3d (N, 3), valid (N,)).
    """
    from visualodometry_tpu.geometry.linalg import smallest_eigvec
    from visualodometry_tpu.geometry.camera import project_points_T

    P1 = jnp.einsum("ij,njk->nik", K, T_cw1[:, :3, :], precision="highest")
    P2 = jnp.matmul(K, T_cw2[:3, :], precision="highest")  # (3, 4)
    a0 = uv1[:, 0:1] * P1[:, 2] - P1[:, 0]
    a1 = uv1[:, 1:2] * P1[:, 2] - P1[:, 1]
    a2 = uv2[:, 0:1] * P2[2] - P2[0]
    a3 = uv2[:, 1:2] * P2[2] - P2[1]
    A = jnp.stack([a0, a1, a2, a3], axis=1)  # (N, 4, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=2, keepdims=True), 1e-12)
    X = smallest_eigvec(
        jnp.matmul(jnp.swapaxes(A, 1, 2), A, precision="highest")
    )
    w = X[:, 3]
    pts = X[:, :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[:, None]

    proj2, z2 = project_points_T(pts, T_cw2, K)
    err2 = jnp.linalg.norm(proj2 - uv2, axis=-1)
    ok = (z2 > cfg.min_depth) & (err2 < cfg.max_reproj_err)
    return pts, ok


def make_klt_step_fn(
    cfg: VOConfig, K, image_hw: tuple[int, int]
) -> Callable[[KLTState, jnp.ndarray, Features], tuple[KLTState, KLTStepOutput]]:
    """Build the KLT-mode step: (state, image, fresh_feats) -> ..."""
    K = jnp.asarray(K, jnp.float32)
    n = cfg.padded_keypoints
    parallax_min = jnp.float32(jnp.deg2rad(cfg.klt_min_parallax_deg))
    suppress_r2 = jnp.float32(cfg.klt_suppress_radius**2)

    def _output(state, **kw):
        defaults = dict(
            T_wc=state.T_wc,
            speed=jnp.float32(0.0),
            initialized=state.initialized,
            did_reset=jnp.asarray(False),
            num_tracked=jnp.int32(0),
            num_landmarks=jnp.int32(0),
            num_promoted=jnp.int32(0),
            kps=state.kps,
            ids=state.ids,
            valid=state.valid,
        )
        defaults.update(kw)
        return KLTStepOutput(**defaults)

    def _replenish(state, fresh: Features):
        """Fill dead slots with fresh detections away from live tracks."""
        live = state.valid
        d2 = jnp.sum(
            (fresh.kps[:, None, :] - state.kps[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(live[None, :], d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=1)  # (N,) per fresh detection
        eligible = fresh.valid & (min_d2 > suppress_r2)

        # assign the j-th eligible detection to the j-th free slot
        free_rank = jnp.cumsum((~live).astype(jnp.int32)) - 1  # per slot
        elig_rank = jnp.cumsum(eligible.astype(jnp.int32)) - 1  # per fresh
        num_free = jnp.sum(~live)
        # for each fresh detection: its destination slot (or n = dropped)
        free_slots = jnp.argsort(live, stable=True)  # free slots first
        dest = jnp.where(
            eligible & (elig_rank < num_free), free_slots[elig_rank % n], n
        )
        T_cw_now = se3_inverse(state.T_wc)
        kps = state.kps.at[dest].set(fresh.kps, mode="drop")
        first_uv = state.first_uv.at[dest].set(fresh.kps, mode="drop")
        ids = state.ids.at[dest].set(
            jnp.full((n,), -1, jnp.int32), mode="drop"
        )
        valid = state.valid.at[dest].set(
            jnp.ones((n,), bool), mode="drop"
        )
        first_T = state.first_T_cw.at[dest].set(
            jnp.broadcast_to(T_cw_now, (n, 4, 4)), mode="drop"
        )
        return state._replace(
            kps=kps, first_uv=first_uv, ids=ids, valid=valid, first_T_cw=first_T
        )

    def _promote(state, num_out):
        """Triangulate candidates whose parallax clears the threshold."""
        T_cw_now = se3_inverse(state.T_wc)
        cand = state.valid & (state.ids == -1)
        b1 = _bearings_world(state.first_uv, state.first_T_cw, K)
        b2 = _bearings_world(
            state.kps, jnp.broadcast_to(T_cw_now, (n, 4, 4)), K
        )
        cosang = jnp.clip(jnp.sum(b1 * b2, axis=-1), -1.0, 1.0)
        enough = jnp.arccos(cosang) > parallax_min
        try_tri = cand & enough

        pts, tri_ok = _triangulate_per_view(
            state.first_T_cw, T_cw_now, state.first_uv, state.kps, K, cfg
        )
        promote = try_tri & tri_ok
        new_map, new_ids = register_landmarks(state.map, pts, promote)
        ids = jnp.where(promote, new_ids, state.ids)
        # candidates that had parallax but failed the gates are dropped
        # (stale candidates would otherwise never triangulate cleanly)
        valid = state.valid & ~(try_tri & ~tri_ok)
        state = state._replace(map=new_map, ids=ids, valid=valid)
        return state, jnp.sum(promote.astype(jnp.int32))

    def step(state: KLTState, img: jnp.ndarray, fresh: Features):
        # accept uint8 frames (the chunk runners upload uint8 to cut
        # host->device bytes 4x, same contract as extract_sift); the
        # carry stores the normalized f32 image
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        img = img.astype(jnp.float32)
        key, k_ess, k_pnp = jax.random.split(state.rng_key, 3)
        state = state._replace(rng_key=key)

        def bootstrap(state):
            # adopt fresh detections as the initial candidate set
            state = state._replace(
                kps=jnp.zeros((n, 2), jnp.float32),
                ids=jnp.full((n,), -1, jnp.int32),
                valid=jnp.zeros((n,), bool),
            )
            state = _replenish(state, fresh)
            state = state._replace(
                image=img, has_tracks=jnp.asarray(True)
            )
            return state, _output(state)

        def run(state):
            new_kps, tracked = klt_track(
                state.image, img, state.kps, state.valid,
                num_levels=cfg.klt_levels, radius=cfg.klt_radius,
                iters=cfg.klt_iters,
            )
            state = state._replace(kps=new_kps, valid=tracked)
            num_tracked = jnp.sum(tracked.astype(jnp.int32))

            def initialize(state):
                # flow from each candidate's FIRST observation
                flow = jnp.linalg.norm(
                    state.kps - state.first_uv, axis=-1
                )
                from visualodometry_tpu.core.step import masked_median

                med = masked_median(flow, state.valid)

                def wait(state):
                    return state, _output(
                        state, num_tracked=num_tracked
                    )

                def try_init(state):
                    ess = estimate_essential_ransac(
                        state.first_uv, state.kps, state.valid, K, cfg, k_ess
                    )

                    def ok(state):
                        R, t = recover_pose(
                            ess.E, state.first_uv, state.kps, ess.inliers, K
                        )
                        T_cw = make_T(R, t * cfg.global_scale)
                        T_wc = se3_inverse(T_cw)
                        state = state._replace(
                            T_wc=T_wc,
                            last_pos=jnp.zeros(3, jnp.float32),
                            baseline_speed=jnp.linalg.norm(T_wc[:3, 3]),
                            initialized=jnp.asarray(True),
                        )
                        state, n_prom = _promote(state, None)
                        return state, _output(
                            state,
                            num_tracked=num_tracked,
                            num_promoted=n_prom,
                            speed=state.baseline_speed,
                        )

                    return jax.lax.cond(ess.ok, ok, wait, state)

                return jax.lax.cond(
                    med < cfg.min_median_flow, wait, try_init, state
                )

            def track(state):
                lm_pts, lm_live = landmark_lookup(state.map, state.ids)
                usable_mask = state.valid & lm_live
                usable = jnp.sum(usable_mask.astype(jnp.int32))

                def lost(state):
                    st = state._replace(
                        initialized=jnp.asarray(False),
                        has_tracks=jnp.asarray(False),
                        valid=jnp.zeros((n,), bool),
                        ids=jnp.full((n,), -1, jnp.int32),
                        map=init_map(cfg)._replace(
                            next_id=state.map.next_id
                        ),
                        last_pos=jnp.zeros(3, jnp.float32),
                        baseline_speed=jnp.float32(1.0),
                    )
                    return st, _output(
                        st, did_reset=jnp.asarray(True),
                        num_tracked=num_tracked,
                    )

                def run_pnp(state):
                    pnp = solve_pnp_ransac(
                        lm_pts, state.kps, usable_mask, K, cfg, k_pnp
                    )

                    def ok(state):
                        T_cw = pnp.T_cw
                        T_wc_raw = se3_inverse(T_cw)
                        raw_pos = T_wc_raw[:3, 3]
                        delta = raw_pos - state.last_pos
                        raw_speed = jnp.linalg.norm(delta)
                        rot = rotation_angle(
                            jnp.matmul(
                                T_cw[:3, :3], state.T_wc[:3, :3],
                                precision="highest",
                            )
                        )
                        is_turning = rot > cfg.turn_thresh
                        is_moving = raw_speed > cfg.move_thresh
                        smoothing = jnp.where(
                            is_turning, cfg.turn_smoothing, cfg.trans_smoothing
                        )
                        target = (
                            smoothing * state.baseline_speed
                            + (1 - smoothing) * raw_speed
                        )
                        scale = jnp.clip(
                            target / jnp.maximum(raw_speed, 1e-12),
                            cfg.scale_clamp_min,
                            cfg.scale_clamp_max,
                        )
                        new_baseline = jnp.where(
                            is_moving & ~is_turning,
                            (1 - cfg.baseline_lr) * state.baseline_speed
                            + cfg.baseline_lr * raw_speed,
                            state.baseline_speed,
                        )
                        T_wc_new = jnp.where(
                            is_moving,
                            T_wc_raw.at[:3, 3].set(
                                state.last_pos + delta * scale
                            ),
                            T_wc_raw,
                        )
                        speed_plot = jnp.where(
                            is_moving,
                            jnp.linalg.norm(delta * scale),
                            0.0,
                        )
                        state = state._replace(
                            T_wc=T_wc_new,
                            last_pos=T_wc_new[:3, 3],
                            baseline_speed=new_baseline,
                            is_turning=jnp.where(
                                is_moving, is_turning, state.is_turning
                            ),
                        )
                        # landmarks whose reprojection failed PnP are cut
                        drop = usable_mask & ~pnp.inliers
                        state = state._replace(valid=state.valid & ~drop)
                        state, n_prom = _promote(state, None)
                        return state, _output(
                            state,
                            num_tracked=num_tracked,
                            num_landmarks=jnp.sum(
                                (usable_mask & pnp.inliers).astype(jnp.int32)
                            ),
                            num_promoted=n_prom,
                            speed=speed_plot,
                        )

                    return jax.lax.cond(pnp.ok, ok, lost, state)

                return jax.lax.cond(
                    usable > cfg.min_inliers, run_pnp, lost, state
                )

            state, out = jax.lax.cond(
                state.initialized, track, initialize, state
            )
            # replenish dead slots with fresh detections, store the frame
            state = _replenish(state, fresh)
            state = state._replace(image=img)
            return state, out

        state, out = jax.lax.cond(state.has_tracks, run, bootstrap, state)
        state = state._replace(frame_id=state.frame_id + 1)
        return state, out

    return step
