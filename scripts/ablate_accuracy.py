#!/usr/bin/env python
"""Stage-ablation harness for the accuracy gap (VERDICT r2 item 1).

The benched TPU pipeline tracks the bench fixture at sim3 ATE ~0.28 m
while the re-executed reference loop does ~0.011 m on identical frames.
This harness localizes the loss: it runs the reference's loop SKELETON
(eval/reference_cv2.py semantics) with each stage independently swapped
between the cv2 implementation and this engine's TPU implementation
(called on the CPU backend — accuracy is what's under test, not speed):

  features    cv2.SIFT detectAndCompute  vs  frontend/sift.py
  matcher     cv2 BF kNN + ratio loop    vs  frontend/matcher.py
  essential   cv2 findEssentialMat/recoverPose vs estimation/essential.py
  pnp         cv2 solvePnPRansac         vs  estimation/pnp.py
  triangulate cv2 triangulatePoints+gates vs geometry/triangulation.py

plus full-engine runs (core/runner.py chunked scan) at both gate
settings (bench: lowe 0.8 + parallax 0.35; reference: 0.75 + none).

Usage: python scripts/ablate_accuracy.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.eval import ate_rmse

N_PAD = 4096


# ---------------------------------------------------------------- features
def cv2_features(u8, cfg):
    import cv2

    sift = cv2.SIFT_create(
        nfeatures=cfg.sift_n_features,
        contrastThreshold=cfg.sift_contrast_threshold,
        edgeThreshold=cfg.sift_edge_threshold,
        sigma=cfg.sift_sigma,
    )
    out = []
    for img in u8:
        kp, des = sift.detectAndCompute(img, None)
        kps = np.array([k.pt for k in kp], np.float64).reshape(-1, 2)
        out.append((kps, des if des is not None else np.zeros((0, 128), np.float32)))
    return out

def tpu_features(u8, cfg):
    from visualodometry_tpu.frontend.sift import extract_sift

    fn = jax.jit(lambda im: extract_sift(im, cfg))
    out = []
    for img in u8:
        f = fn(jnp.asarray(img))
        v = np.asarray(f.valid)
        out.append((np.asarray(f.kps, np.float64)[v], np.asarray(f.desc, np.float32)[v]))
    return out


# ---------------------------------------------------------------- matchers
def make_cv2_match(ratio):
    import cv2

    matcher = cv2.BFMatcher(cv2.NORM_L2, crossCheck=False)

    def match(des_ref, des_curr):
        if not len(des_ref) or not len(des_curr):
            return np.zeros((0, 2), int)
        knn = matcher.knnMatch(des_ref, des_curr, k=2)
        good = []
        for pair in knn:
            if len(pair) == 2:
                m, nn = pair
                if m.distance < ratio * nn.distance:
                    good.append([m.queryIdx, m.trainIdx])
        return np.asarray(good, int).reshape(-1, 2)

    return match


def make_tpu_match(ratio):
    from visualodometry_tpu.frontend.matcher import match_descriptors

    fn = jax.jit(
        lambda d0, v0, d1, v1: match_descriptors(
            d0, v0, d1, v1, ratio=ratio, mutual=False, backend="jnp"
        )
    )

    def match(des_ref, des_curr):
        n0, n1 = len(des_ref), len(des_curr)
        d0 = np.zeros((N_PAD, 128), np.float32)
        d1 = np.zeros((N_PAD, 128), np.float32)
        d0[:n0] = des_ref
        d1[:n1] = des_curr
        v0 = np.arange(N_PAD) < n0
        v1 = np.arange(N_PAD) < n1
        res = fn(d0, v0, d1, v1)
        ok = np.asarray(res.valid)[:n0]
        idx = np.asarray(res.idx)[:n0]
        q = np.nonzero(ok)[0]
        return np.stack([q, idx[q]], axis=1) if len(q) else np.zeros((0, 2), int)

    return match


# ---------------------------------------------------------------- essential
def make_cv2_essential(K, cfg):
    import cv2

    def essential(uv_ref, uv_curr, key):
        E, _ = cv2.findEssentialMat(
            uv_ref, uv_curr, K,
            method=cv2.RANSAC,
            prob=cfg.init_ransac_prob,
            threshold=cfg.init_ransac_thresh,
        )
        if E is None:
            return None
        _, R, t, _ = cv2.recoverPose(E, uv_ref, uv_curr, K)
        return R, t.flatten()

    return essential


def make_tpu_essential(K, cfg):
    from visualodometry_tpu.estimation.essential import (
        estimate_essential_ransac,
        recover_pose,
    )

    Kj = jnp.asarray(K, jnp.float32)

    @jax.jit
    def fn(uv_ref, uv_curr, valid, key):
        ess = estimate_essential_ransac(uv_ref, uv_curr, valid, Kj, cfg, key)
        R, t = recover_pose(ess.E, uv_ref, uv_curr, ess.inliers, Kj)
        return ess.ok, R, t

    def essential(uv_ref, uv_curr, key):
        m = len(uv_ref)
        ur = np.zeros((N_PAD, 2), np.float32)
        uc = np.zeros((N_PAD, 2), np.float32)
        ur[:m] = uv_ref
        uc[:m] = uv_curr
        valid = np.arange(N_PAD) < m
        ok, R, t = fn(ur, uc, valid, key)
        if not bool(ok):
            return None
        return np.asarray(R, np.float64), np.asarray(t, np.float64)

    return essential


# ---------------------------------------------------------------- pnp
def make_cv2_pnp(K, cfg):
    import cv2

    def pnp(pts3d, pts2d, key):
        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            pts3d, pts2d, K, None, reprojectionError=cfg.pnp_reproj_err
        )
        if not ok:
            return None
        R, _ = cv2.Rodrigues(rvec)
        T_cw = np.eye(4)
        T_cw[:3, :3] = R
        T_cw[:3, 3] = tvec.flatten()
        inl = inliers.flatten() if inliers is not None else np.arange(len(pts2d))
        return T_cw, inl

    return pnp


def make_tpu_pnp(K, cfg):
    from visualodometry_tpu.estimation.pnp import solve_pnp_ransac

    Kj = jnp.asarray(K, jnp.float32)
    fn = jax.jit(
        lambda p3, uv, valid, key: solve_pnp_ransac(p3, uv, valid, Kj, cfg, key)
    )

    def pnp(pts3d, pts2d, key):
        m = len(pts3d)
        p3 = np.zeros((N_PAD, 3), np.float32)
        uv = np.zeros((N_PAD, 2), np.float32)
        p3[:m] = pts3d
        uv[:m] = pts2d
        valid = np.arange(N_PAD) < m
        res = fn(p3, uv, valid, key)
        if not bool(res.ok):
            return None
        T_cw = np.asarray(res.T_cw, np.float64)
        inl = np.nonzero(np.asarray(res.inliers)[:m])[0]
        return T_cw, inl

    return pnp


# ---------------------------------------------------------------- triangulate
def make_cv2_triangulate(K, cfg):
    import cv2

    def triangulate(T_cw1, T_cw2, pts1, pts2):
        P1 = K @ T_cw1[:3, :]
        P2 = K @ T_cw2[:3, :]
        Xh = cv2.triangulatePoints(P1, P2, pts1.T.astype(float), pts2.T.astype(float))
        X = (Xh[:3] / Xh[3:]).T
        Xc2 = (T_cw2[:3, :3] @ X.T).T + T_cw2[:3, 3]
        depth_ok = Xc2[:, 2] > cfg.min_depth
        rvec2, _ = cv2.Rodrigues(T_cw2[:3, :3])
        proj2, _ = cv2.projectPoints(X, rvec2, T_cw2[:3, 3], K, None)
        err2 = np.linalg.norm(proj2.reshape(-1, 2) - pts2, axis=1)
        return X, depth_ok & (err2 < cfg.max_reproj_err)

    return triangulate


def make_tpu_triangulate(K, cfg):
    from visualodometry_tpu.geometry.triangulation import triangulate_points

    Kj = jnp.asarray(K, jnp.float32)
    fn = jax.jit(
        lambda t1, t2, p1, p2, v: triangulate_points(
            t1, t2, p1, p2, Kj, cfg, valid_in=v
        )
    )

    def triangulate(T_cw1, T_cw2, pts1, pts2):
        m = len(pts1)
        p1 = np.zeros((N_PAD, 2), np.float32)
        p2 = np.zeros((N_PAD, 2), np.float32)
        p1[:m] = pts1
        p2[:m] = pts2
        v = np.arange(N_PAD) < m
        X, ok = fn(
            T_cw1.astype(np.float32), T_cw2.astype(np.float32), p1, p2, v
        )
        return np.asarray(X, np.float64)[:m], np.asarray(ok)[:m]

    return triangulate


# ---------------------------------------------------------------- loop skeleton
def run_loop(feats, K, cfg, match, essential, pnp, triangulate, seed=0):
    """Reference loop skeleton (eval/reference_cv2.py semantics) with
    injected stages. Returns (positions, stats)."""
    rng_keys = iter(jax.random.split(jax.random.key(seed), 4 * len(feats)))

    class S:
        initialized = False
        map_points: dict = {}
        next_pt_id = 0
        T_wc = np.eye(4)
        last_pos = np.zeros(3)
        baseline_speed = 1.0
        keyframe = None
        num_resets = 0
        num_keyframes = 0
        inlier_log: list = []

    def do_triangulate(kps, curr_ids, ref_idx, curr_idx):
        T_cw_ref = np.linalg.inv(S.keyframe["T_wc"])
        T_cw_curr = np.linalg.inv(S.T_wc)
        no_id = curr_ids[curr_idx] == -1
        if no_id.sum() > 0:
            uv_ref = S.keyframe["kps"][ref_idx[no_id]]
            uv_curr = kps[curr_idx[no_id]]
            X, valid = triangulate(T_cw_ref, T_cw_curr, uv_ref, uv_curr)
            targets = curr_idx[no_id]
            for i in np.nonzero(valid)[0]:
                S.map_points[S.next_pt_id] = X[i]
                curr_ids[targets[i]] = S.next_pt_id
                S.next_pt_id += 1

    def create_keyframe(kps, des, curr_ids, ref_idx, curr_idx):
        do_triangulate(kps, curr_ids, ref_idx, curr_idx)
        S.keyframe = {"kps": kps, "des": des, "ids": curr_ids, "T_wc": S.T_wc.copy()}
        S.num_keyframes += 1
        cutoff = S.next_pt_id - 20000
        if cutoff > 0:
            for pid in [p for p in S.map_points if p < cutoff]:
                del S.map_points[pid]

    def reset():
        S.initialized = False
        S.map_points = {}
        S.keyframe = None
        S.last_pos = np.zeros(3)
        S.baseline_speed = 1.0
        S.num_resets += 1

    positions = np.zeros((len(feats), 3))
    for f, (kps, des) in enumerate(feats):
        curr_ids = np.full(len(kps), -1, dtype=int)
        if S.keyframe is None:
            S.keyframe = {"kps": kps, "des": des, "ids": curr_ids, "T_wc": np.eye(4)}
            positions[f] = S.T_wc[:3, 3]
            continue

        matches = match(S.keyframe["des"], des)
        ref_idx, curr_idx = matches[:, 0], matches[:, 1]

        if not S.initialized:
            uv_ref = S.keyframe["kps"][ref_idx]
            uv_curr = kps[curr_idx]
            flow = (
                float(np.median(np.linalg.norm(uv_ref - uv_curr, axis=1)))
                if len(uv_ref) else 0.0
            )
            if flow >= cfg.min_median_flow:
                res = essential(uv_ref, uv_curr, next(rng_keys))
                if res is not None:
                    R, t = res
                    T_cw = np.eye(4)
                    T_cw[:3, :3] = R
                    T_cw[:3, 3] = t * cfg.global_scale
                    S.T_wc = np.linalg.inv(T_cw)
                    S.last_pos = np.zeros(3)
                    S.baseline_speed = float(np.linalg.norm(S.T_wc[:3, 3]))
                    S.initialized = True
                    create_keyframe(kps, des, curr_ids, ref_idx, curr_idx)
        else:
            kf_ids = S.keyframe["ids"][ref_idx]
            valid = np.array(
                [(pid != -1 and pid in S.map_points) for pid in kf_ids], bool
            ).reshape(-1)
            if valid.sum() > cfg.min_inliers:
                pnp_3d = np.array([S.map_points[pid] for pid in kf_ids[valid]])
                pnp_2d = kps[curr_idx[valid]]
                res = pnp(pnp_3d, pnp_2d, next(rng_keys))
                if res is not None:
                    T_cw, inliers = res
                    S.inlier_log.append(len(inliers))
                    T_wc_raw = np.linalg.inv(T_cw)
                    raw_pos = T_wc_raw[:3, 3]
                    delta = raw_pos - S.last_pos
                    raw_speed = float(np.linalg.norm(delta))
                    import cv2

                    rel, _ = cv2.Rodrigues(T_cw[:3, :3] @ S.T_wc[:3, :3])
                    turning = float(np.linalg.norm(rel)) > cfg.turn_thresh
                    moving = raw_speed > cfg.move_thresh
                    if moving:
                        sm = cfg.turn_smoothing if turning else cfg.trans_smoothing
                        target = sm * S.baseline_speed + (1 - sm) * raw_speed
                        if not turning:
                            S.baseline_speed = (
                                1 - cfg.baseline_lr
                            ) * S.baseline_speed + cfg.baseline_lr * raw_speed
                        scale = np.clip(
                            target / raw_speed, cfg.scale_clamp_min, cfg.scale_clamp_max
                        )
                        S.T_wc = T_wc_raw.copy()
                        S.T_wc[:3, 3] = S.last_pos + delta * scale
                    else:
                        S.T_wc = T_wc_raw
                    S.last_pos = S.T_wc[:3, 3].copy()

                    tracked_idx = curr_idx[valid]
                    tracked_ids = kf_ids[valid]
                    for i in inliers:
                        curr_ids[tracked_idx[i]] = tracked_ids[i]

                    uv_ref = S.keyframe["kps"][ref_idx]
                    uv_curr = kps[curr_idx]
                    flow = float(np.median(np.linalg.norm(uv_ref - uv_curr, axis=1)))
                    if flow > cfg.min_median_flow or (curr_ids != -1).sum() < cfg.kf_min_tracked:
                        create_keyframe(kps, des, curr_ids, ref_idx, curr_idx)
                else:
                    reset()
            else:
                reset()
        positions[f] = S.T_wc[:3, 3]
    return positions, {
        "resets": S.num_resets,
        "keyframes": S.num_keyframes,
        "map": len(S.map_points),
        "med_inl": float(np.median(S.inlier_log)) if S.inlier_log else 0,
    }


def main():
    sys.path.insert(0, "/root/repo")
    from bench import _build_cfg, _load_fixture, _reference_cfg

    u8, gt, K = _load_fixture()
    K = np.asarray(K, np.float64)
    ref_cfg = _reference_cfg()
    tpu_cfg = _build_cfg()

    print("extracting cv2 features...", flush=True)
    t0 = time.time()
    fe_cv2 = cv2_features(u8, ref_cfg)
    print(f"  {time.time()-t0:.1f}s, kps/frame median "
          f"{np.median([len(k) for k, _ in fe_cv2]):.0f}", flush=True)
    print("extracting tpu features (CPU backend)...", flush=True)
    t0 = time.time()
    fe_tpu = tpu_features(u8, tpu_cfg)
    print(f"  {time.time()-t0:.1f}s, kps/frame median "
          f"{np.median([len(k) for k, _ in fe_tpu]):.0f}", flush=True)

    def stages(which, cfg):
        return dict(
            match=(make_cv2_match if which["match"] == "cv2" else make_tpu_match)(
                cfg.lowe_ratio
            ),
            essential=(
                make_cv2_essential if which["ess"] == "cv2" else make_tpu_essential
            )(K, cfg),
            pnp=(make_cv2_pnp if which["pnp"] == "cv2" else make_tpu_pnp)(K, cfg),
            triangulate=(
                make_cv2_triangulate if which["tri"] == "cv2" else make_tpu_triangulate
            )(K, cfg),
        )

    ALL_CV2 = {"match": "cv2", "ess": "cv2", "pnp": "cv2", "tri": "cv2"}
    ALL_TPU = {"match": "tpu", "ess": "tpu", "pnp": "tpu", "tri": "tpu"}

    runs = [
        ("A  cv2 feats + all-cv2 (ref cfg)        ", fe_cv2, ALL_CV2, ref_cfg),
        ("B  TPU feats + all-cv2 (ref cfg)        ", fe_tpu, ALL_CV2, ref_cfg),
        ("C  cv2 feats + TPU match                ", fe_cv2, {**ALL_CV2, "match": "tpu"}, ref_cfg),
        ("D  cv2 feats + TPU essential            ", fe_cv2, {**ALL_CV2, "ess": "tpu"}, ref_cfg),
        ("E  cv2 feats + TPU pnp                  ", fe_cv2, {**ALL_CV2, "pnp": "tpu"}, ref_cfg),
        ("F  cv2 feats + TPU triangulate          ", fe_cv2, {**ALL_CV2, "tri": "tpu"}, ref_cfg),
        ("G  TPU feats + all-TPU (ref cfg gates)  ", fe_tpu, ALL_TPU, ref_cfg),
        ("H  TPU feats + all-TPU (bench cfg gates)", fe_tpu, ALL_TPU,
         tpu_cfg.replace(global_scale=ref_cfg.global_scale)),
        ("I  cv2 feats + all-TPU (ref cfg)        ", fe_cv2, ALL_TPU, ref_cfg),
    ]
    for name, feats, which, cfg in runs:
        pos, st = run_loop(feats, K, cfg, **stages(which, cfg))
        ate = float(ate_rmse(pos[8:], gt[8:], align="sim3"))
        print(f"{name} ATE {ate:8.4f}  resets {st['resets']} "
              f"kf {st['keyframes']} map {st['map']} medinl {st['med_inl']:.0f}",
              flush=True)


if __name__ == "__main__":
    main()
