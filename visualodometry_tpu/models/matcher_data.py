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
