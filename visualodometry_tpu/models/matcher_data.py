"""Real-descriptor training data for the attention matcher.

Round-1's matcher trained on abstract "descriptor twin" problems
(train_matcher.synthetic_match_batch) and reached recall 0.20 on noisy
descriptors — the distribution gap, not the architecture, was the
limit (VERDICT r1 item 4). This module builds match problems from the
ACTUAL frontend: textured homography-warped image pairs are run through
the SIFT extractor (frontend/sift.py), and ground-truth assignments come
from the homography — exactly the supervision LightGlue gets from
homography-augmented image data (reference pins those released weights,
src/modules/frontend.py:23; we must train our own).

The dataset is pre-extracted once (SIFT on every pair) and then sampled
into minibatches, so matcher training is not extraction-bound.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.models.train_matcher import MatchBatch
from visualodometry_tpu.models.train_superpoint_textured import (
    _add_polygons,
    _random_homography,
    _value_noise,
    _warp,
)


def build_sift_match_dataset(
    rng: np.random.Generator,
    n_pairs: int = 256,
    hw: tuple[int, int] = (240, 320),
    n_slots: int = 512,
    strength: float = 0.10,
    match_tol: float = 3.0,
    log_every: int = 64,
) -> dict:
    """Extract SIFT on homography pairs; GT assignment from the warp.

    Returns numpy arrays {kps0, desc0, valid0, kps1, desc1, valid1,
    gt_idx} with leading axis n_pairs. Keypoint coords are normalized to
    [-1, 1] (the attention matcher's input convention,
    models/attention_matcher.normalize_kps).
    """
    from visualodometry_tpu.frontend.sift import extract_sift

    H, W = hw
    cfg = VOConfig(
        extractor_type="sift",
        max_keypoints=n_slots,
        sift_n_features=n_slots,
        sift_contrast_threshold=0.02,
        sift_num_octaves=3,
        image_size=(W, H),
    )
    out = {
        k: []
        for k in (
            "kps0",
            "desc0",
            "valid0",
            "kps1",
            "desc1",
            "valid1",
            "gt_idx",
        )
    }
    norm = np.array([W, H], np.float32)
    for i in range(n_pairs):
        base = _add_polygons(rng, _value_noise(rng, H, W))
        Hmat = _random_homography(rng, H, W, strength)
        img1 = _warp(base, Hmat)

        f0 = extract_sift(jnp.asarray(base), cfg)
        f1 = extract_sift(jnp.asarray(img1), cfg)
        k0 = np.asarray(f0.kps)
        k1 = np.asarray(f1.kps)
        v0 = np.asarray(f0.valid)
        v1 = np.asarray(f1.valid)

        # map frame-0 keypoints through H; match to nearest frame-1 slot
        p = np.concatenate([k0, np.ones((len(k0), 1), np.float32)], axis=1)
        q = (Hmat @ p.T).T
        uv = q[:, :2] / np.maximum(np.abs(q[:, 2:]), 1e-9) * np.sign(q[:, 2:])
        inb = (
            v0
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < W)
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < H)
        )
        d = np.linalg.norm(uv[:, None, :] - k1[None, :, :], axis=-1)
        d[:, ~v1] = np.inf
        nearest = d.argmin(axis=1)
        ok = inb & (d[np.arange(len(k0)), nearest] < match_tol)
        # enforce one-to-one: a frame-1 slot may be claimed once (best d)
        gt = np.full(len(k0), -1, np.int32)
        order = np.argsort(d[np.arange(len(k0)), nearest])
        taken = np.zeros(len(k1), bool)
        for idx in order:
            if ok[idx] and not taken[nearest[idx]]:
                gt[idx] = nearest[idx]
                taken[nearest[idx]] = True

        out["kps0"].append(k0 / norm * 2.0 - 1.0)
        out["desc0"].append(np.asarray(f0.desc))
        out["valid0"].append(v0)
        out["kps1"].append(k1 / norm * 2.0 - 1.0)
        out["desc1"].append(np.asarray(f1.desc))
        out["valid1"].append(v1)
        out["gt_idx"].append(gt)
        if log_every and (i + 1) % log_every == 0:
            print(f"dataset {i + 1}/{n_pairs}", flush=True)
    return {k: np.stack(v) for k, v in out.items()}


def build_vo_match_dataset(
    rng: np.random.Generator,
    n_pairs: int = 96,
    image_size: tuple[int, int] = (1226, 370),
    n_slots: int = 4096,
    speed: float = 2.4,
    gaps: tuple = (1, 2),
    match_tol: float = 3.0,
    log_every: int = 16,
) -> dict:
    """Deployment-regime match problems (VERDICT r4 weak #5).

    The homography dataset trains at 512 slots / 240x320 / small warps;
    deployment matches 4096 SIFT slots on full-res KITTI-shape frames
    with marathon-magnitude flows and true parallax. This builds pairs
    from consecutive textured-corridor frames at the marathon frame
    speed (gap 2 = the 2x-frame-speed regime where the r4 matcher had
    its held-out reset), with GT assignment from the rendered depth
    (data/synthetic.gt_correspondence), one-to-one enforced.
    """
    from visualodometry_tpu.data.synthetic import (
        gt_correspondence,
        make_scene,
        render_textured_image,
    )
    from visualodometry_tpu.frontend.sift import extract_sift

    W, H = image_size
    cfg = VOConfig(
        extractor_type="sift",
        max_keypoints=n_slots,
        sift_n_features=n_slots,
        sift_contrast_threshold=0.02,
        sift_num_octaves=3,
        image_size=image_size,
    )
    norm = np.array([W, H], np.float32)
    out = {
        k: []
        for k in (
            "kps0", "desc0", "valid0", "kps1", "desc1", "valid1", "gt_idx",
        )
    }
    max_gap = max(gaps)
    frames_per_scene = 8
    n_scenes = int(np.ceil(n_pairs / (len(gaps) * (frames_per_scene - max_gap))))
    made = 0
    for s in range(n_scenes):
        scene = make_scene(
            rng, num_frames=frames_per_scene, speed=speed,
            turn_rate=rng.uniform(0.0, 0.006), num_landmarks=2,
            image_size=image_size,
        )
        rendered = [
            render_textured_image(scene, f, with_depth=True)
            for f in range(frames_per_scene)
        ]
        feats = [
            extract_sift(jnp.asarray(im.astype(np.float32)), cfg)
            for im, _ in rendered
        ]
        for a in range(frames_per_scene - max_gap):
            for g in gaps:
                if made >= n_pairs:
                    break
                b = a + g
                f0, f1 = feats[a], feats[b]
                k0 = np.asarray(f0.kps, np.float64)
                k1 = np.asarray(f1.kps, np.float64)
                v0 = np.asarray(f0.valid)
                v1 = np.asarray(f1.valid)
                uv, ok_d = gt_correspondence(
                    scene, a, b, k0.astype(np.float32), rendered[a][1]
                )
                inb = (
                    v0 & ok_d
                    & (uv[:, 0] >= 0) & (uv[:, 0] < W)
                    & (uv[:, 1] >= 0) & (uv[:, 1] < H)
                )
                d = np.linalg.norm(
                    uv[:, None, :] - k1[None, :, :], axis=-1
                )
                d[:, ~v1] = np.inf
                nearest = d.argmin(axis=1)
                dmin = d[np.arange(len(k0)), nearest]
                ok = inb & (dmin < match_tol)
                gt = np.full(len(k0), -1, np.int32)
                order = np.argsort(dmin)
                taken = np.zeros(len(k1), bool)
                for idx in order:
                    if ok[idx] and not taken[nearest[idx]]:
                        gt[idx] = nearest[idx]
                        taken[nearest[idx]] = True
                out["kps0"].append((k0 / norm * 2.0 - 1.0).astype(np.float32))
                out["desc0"].append(np.asarray(f0.desc))
                out["valid0"].append(v0)
                out["kps1"].append((k1 / norm * 2.0 - 1.0).astype(np.float32))
                out["desc1"].append(np.asarray(f1.desc))
                out["valid1"].append(v1)
                out["gt_idx"].append(gt)
                made += 1
        if log_every and (s + 1) % max(1, log_every // 8) == 0:
            print(f"vo dataset scenes {s + 1}/{n_scenes} pairs {made}",
                  flush=True)
        if made >= n_pairs:
            break
    return {k: np.stack(v) for k, v in out.items()}


def subsample_slots(
    b: dict, rng: np.random.Generator, n_sub: int
) -> dict:
    """Random slot subset per pair (gt indices remapped).

    Training at the full 4096-slot width is O(N^2)-attention slow; a
    random subset preserves the position/flow/descriptor distribution
    (what transfers) while keeping train steps fast. Valid slots are
    preferred; padding fills the remainder.
    """
    B, N = b["valid0"].shape
    out = {k: np.empty((B, n_sub) + v.shape[2:], v.dtype)
           for k, v in b.items()}
    for i in range(B):
        for side in ("0", "1"):
            v = b[f"valid{side}"][i]
            pool = np.nonzero(v)[0]
            pad = np.nonzero(~v)[0]
            if len(pool) >= n_sub:
                keep = rng.choice(pool, n_sub, replace=False)
            else:
                keep = np.concatenate(
                    [pool, rng.choice(pad, n_sub - len(pool), replace=False)]
                )
            keep.sort()
            if side == "0":
                keep0 = keep
            else:
                keep1 = keep
        inv1 = np.full(N, -1, np.int64)
        inv1[keep1] = np.arange(n_sub)
        for k in ("kps0", "desc0", "valid0"):
            out[k][i] = b[k][i][keep0]
        for k in ("kps1", "desc1", "valid1"):
            out[k][i] = b[k][i][keep1]
        g = b["gt_idx"][i][keep0]
        out["gt_idx"][i] = np.where(g >= 0, inv1[g], -1).astype(np.int32)
    return out


def sample_batch(
    data: dict, rng: np.random.Generator, batch: int
) -> MatchBatch:
    """Random minibatch with slot-dropout augmentation."""
    n_total = len(data["kps0"])
    sel = rng.integers(0, n_total, batch)
    b = {k: v[sel].copy() for k, v in data.items()}
    n = b["kps0"].shape[1]
    for i in range(batch):  # random slot dropout (padding realism)
        drop0 = rng.choice(n, n // 10, replace=False)
        drop1 = rng.choice(n, n // 10, replace=False)
        b["valid0"][i, drop0] = False
        b["valid1"][i, drop1] = False
        b["gt_idx"][i, drop0] = -1
        b["gt_idx"][i, np.isin(b["gt_idx"][i], drop1)] = -1
    return MatchBatch(
        kps0=jnp.asarray(b["kps0"]),
        desc0=jnp.asarray(b["desc0"]),
        valid0=jnp.asarray(b["valid0"]),
        kps1=jnp.asarray(b["kps1"]),
        desc1=jnp.asarray(b["desc1"]),
        valid1=jnp.asarray(b["valid1"]),
        gt_idx=jnp.asarray(b["gt_idx"]),
    )
