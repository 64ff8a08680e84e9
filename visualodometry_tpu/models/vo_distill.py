"""SuperPoint r4 distillation stage: VO pairs + SIFT-teacher labels.

The r2/r3 curriculum (train_superpoint_textured.py) taught the CNN on
homography pairs with Harris-cell labels; it tracks the bench fixture
reset-free but at ~20x the SIFT path's ATE (BENCH_r03). The two gaps it
left (VERDICT r3 item 2):
  - the TEACHER: Harris single-scale corners, not the keypoints the
    engine's own proven SIFT frontend detects (sim3 ATE 0.011 on the
    same fixture — it IS the reference-grade detector here);
  - the PAIRS: homographies only — no true parallax, while deployment
    matches consecutive forward-motion frames.
This module adds both: a pre-rendered pool of consecutive corridor
frames with exact depth maps (data/synthetic.render_textured_image
with_depth), SIFT-keypoint cell labels computed once per pool image,
and TrainBatchH batches whose cell correspondence comes from true
depth reprojection between the frames (not a homography).

Crops are 8-aligned so full-image cell labels slice directly.
"""

from __future__ import annotations

import os

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.models.train_superpoint_textured import (
    TrainBatchH,
    loss_fn_h,
)


class TrainBatchSub(NamedTuple):
    """TrainBatchH + view-0 subpixel regression targets."""

    h: TrainBatchH
    sub0: jnp.ndarray  # (B, Hc, Wc, 2) subpixel (x, y) in-cell, [0, 8)
    subv0: jnp.ndarray  # (B, Hc, Wc) bool


def loss_fn_sub(params, model, batch: TrainBatchSub, desc_w=1.0, sub_w=0.25):
    """Deep CE/InfoNCE loss + expected-coordinate subpixel regression.

    The detector head's within-cell 8x8 softmax mass is pulled so its
    EXPECTED position matches the SIFT teacher's subpixel location
    (Huber, px units). This is the spatial-metric term the 65-way CE
    lacks — CE scores a 1-px miss and a 7-px miss identically, which
    capped learned-detector localization at ~1.5 px (r4 measurement,
    scripts/feat_quality.py) while the SIFT path does 0.18 px.
    """
    total, aux = loss_fn_h(params, model, batch.h, desc_w=desc_w)
    det0, _ = model.apply(params, batch.h.img0[..., None])
    prob = jax.nn.softmax(det0, axis=-1)[..., :64]
    mass = jnp.maximum(prob.sum(-1, keepdims=True), 1e-6)
    p = prob / mass  # within-cell distribution
    jj = jnp.arange(8, dtype=jnp.float32)
    py = p.reshape(*p.shape[:-1], 8, 8)
    ex = jnp.einsum("...ij,j->...", py, jj) + 0.5  # expected x in-cell
    ey = jnp.einsum("...ij,i->...", py, jj) + 0.5
    dx = ex - batch.sub0[..., 0]
    dy = ey - batch.sub0[..., 1]
    r = jnp.sqrt(dx * dx + dy * dy + 1e-9)
    huber = jnp.where(r < 1.0, 0.5 * r * r, r - 0.5)
    w = batch.subv0.astype(jnp.float32)
    sub_loss = jnp.sum(huber * w) / jnp.maximum(jnp.sum(w), 1.0)
    return total + sub_w * sub_loss, (*aux, sub_loss)


def sift_cell_labels(kps, resp, H, W):
    """65-way cell labels + SUBPIXEL targets from SIFT keypoints.

    kps: (N, 2) pixel (x, y); resp: (N,) strength for tie-breaks.
    Returns (labels (H//8, W//8) int32 — dustbin 64 where empty,
    sub (H//8, W//8, 2) float32 — the keypoint's subpixel (x, y)
    WITHIN the cell in [0, 8); zeros where empty). The subpixel target
    is what the expected-coordinate regression loss consumes
    (vo_distill.loss_fn_sub) — the r3 65-way CE alone
    treats every pixel miss equally, which capped the learned
    detector's localization at ~1.5 px (scripts/feat_quality.py).
    """
    hc, wc = H // 8, W // 8
    labels = np.full((hc, wc), 64, np.int32)
    sub = np.zeros((hc, wc, 2), np.float32)
    best = np.full((hc, wc), -np.inf, np.float32)
    xi = np.clip(np.round(kps[:, 0]).astype(int), 0, W - 1)
    yi = np.clip(np.round(kps[:, 1]).astype(int), 0, H - 1)
    ci, cj = yi // 8, xi // 8
    subcls = (yi % 8) * 8 + (xi % 8)
    for k in range(len(kps)):
        i, j = ci[k], cj[k]
        if i < hc and j < wc and resp[k] > best[i, j]:
            best[i, j] = resp[k]
            labels[i, j] = subcls[k]
            sub[i, j, 0] = np.clip(kps[k, 0] - j * 8.0, 0.0, 7.999)
            sub[i, j, 1] = np.clip(kps[k, 1] - i * 8.0, 0.0, 7.999)
    return labels, sub


def build_vo_pool(
    rng: np.random.Generator,
    n_scenes: int = 16,
    frames_per_scene: int = 8,
    render_size: tuple[int, int] = (640, 360),
    cache: str | None = None,
    sift_slots: int = 1024,
):
    """Render corridor scenes with depth + SIFT-teacher labels.

    Returns dict of arrays: imgs (N,H,W) f32, depth (N,H,W) f32,
    labels (N,Hc,Wc) i32, T_wc (N,4,4), scene_id (N,), K (3,3).
    SIFT runs with the cv2-parity -1 octave so the teacher population
    matches cv2's (frontend/sift.py r4).
    """
    if cache and os.path.exists(cache):
        return dict(np.load(cache))
    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.data.synthetic import (
        make_scene,
        render_textured_image,
    )
    from visualodometry_tpu.frontend.sift import extract_sift

    W, H = render_size
    cfg = VOConfig(
        extractor_type="sift",
        max_keypoints=sift_slots,
        sift_n_features=sift_slots,
        sift_contrast_threshold=0.015,
        sift_num_octaves=4,
        sift_first_octave=-1,
        image_size=render_size,
    )
    imgs, depths, labels, subs, poses, sids = [], [], [], [], [], []
    K = None
    for s in range(n_scenes):
        scene = make_scene(
            rng,
            num_frames=frames_per_scene,
            speed=float(rng.uniform(0.9, 2.6)),
            turn_rate=float(rng.uniform(-0.008, 0.008)),
            image_size=render_size,
        )
        K = scene.K
        for f in range(frames_per_scene):
            img, depth = render_textured_image(scene, f, with_depth=True)
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
            feats = extract_sift(jnp.asarray(img), cfg)
            v = np.asarray(feats.valid)
            kps = np.asarray(feats.kps)[v]
            # response proxy: keep insertion strength by order (top-k
            # already sorts per octave; ties rare) — use descending rank
            resp = -np.arange(len(kps), dtype=np.float32)
            lab, sub = sift_cell_labels(kps, resp, H, W)
            labels.append(lab)
            subs.append(sub)
            imgs.append(img)
            depths.append(depth.astype(np.float32))
            poses.append(scene.poses_T_wc[f].astype(np.float32))
            sids.append(s)
    out = dict(
        imgs=np.stack(imgs),
        depth=np.stack(depths),
        labels=np.stack(labels),
        labels_sub=np.stack(subs),
        T_wc=np.stack(poses),
        scene_id=np.asarray(sids, np.int32),
        K=np.asarray(K, np.float32),
    )
    if cache:
        np.savez_compressed(cache, **out)
    return out


def _jitter(rng, im):
    g = rng.uniform(0.8, 1.25)
    gain = rng.uniform(0.8, 1.15)
    off = rng.uniform(-0.06, 0.06)
    im = np.clip(gain * np.power(np.clip(im, 0, 1), g) + off, 0, 1)
    return np.clip(im + rng.normal(0, 0.015, im.shape), 0, 1).astype(
        np.float32
    )


def vo_pair_batch(
    rng: np.random.Generator,
    pool: dict,
    batch: int = 16,
    hw: tuple[int, int] = (320, 640),
) -> TrainBatchSub:
    """Consecutive-frame batches with depth-GT cell correspondence."""
    H, W = hw
    hc, wc = H // 8, W // 8
    imgs, depth, labels = pool["imgs"], pool["depth"], pool["labels"]
    labels_sub = pool["labels_sub"]
    T_wc, sid, K = pool["T_wc"], pool["scene_id"], pool["K"]
    FH, FW = imgs.shape[1:]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    img0 = np.zeros((batch, H, W), np.float32)
    img1 = np.zeros((batch, H, W), np.float32)
    labels0 = np.zeros((batch, hc, wc), np.int32)
    labels1 = np.zeros((batch, hc, wc), np.int32)
    sub0 = np.zeros((batch, hc, wc, 2), np.float32)
    cell_tgt = np.zeros((batch, hc, wc, 2), np.int32)
    cell_valid = np.zeros((batch, hc, wc), bool)

    # cell-center pixel coords within the crop
    ci = (np.arange(hc) * 8 + 3.5)[:, None]
    cj = (np.arange(wc) * 8 + 3.5)[None, :]

    n = len(imgs)
    for b in range(batch):
        while True:
            f0 = int(rng.integers(0, n - 1))
            if sid[f0 + 1] == sid[f0]:
                break
        f1 = f0 + 1
        oy = int(rng.integers(0, max((FH - H) // 8, 1))) * 8
        ox = int(rng.integers(0, max((FW - W) // 8, 1))) * 8
        img0[b] = _jitter(rng, imgs[f0, oy : oy + H, ox : ox + W])
        img1[b] = _jitter(rng, imgs[f1, oy : oy + H, ox : ox + W])
        labels0[b] = labels[f0, oy // 8 : oy // 8 + hc, ox // 8 : ox // 8 + wc]
        labels1[b] = labels[f1, oy // 8 : oy // 8 + hc, ox // 8 : ox // 8 + wc]
        sub0[b] = labels_sub[
            f0, oy // 8 : oy // 8 + hc, ox // 8 : ox // 8 + wc
        ]

        # depth reprojection of cell centers: frame0 -> world -> frame1
        u = cj + ox
        v = ci + oy
        d = depth[f0][
            np.clip(v.astype(int), 0, FH - 1),
            np.clip(u.astype(int), 0, FW - 1),
        ]
        finite = np.isfinite(d)
        xc = (u - cx) / fx * d
        yc = (v - cy) / fy * d
        pc0 = np.stack(
            [xc, yc, np.broadcast_to(d, xc.shape)], axis=-1
        )  # (hc, wc, 3)
        R0, t0 = T_wc[f0, :3, :3], T_wc[f0, :3, 3]
        R1, t1 = T_wc[f1, :3, :3], T_wc[f1, :3, 3]
        pw = pc0 @ R0.T + t0
        pc1 = (pw - t1) @ R1
        z1 = pc1[..., 2]
        u1 = pc1[..., 0] / np.maximum(z1, 1e-6) * fx + cx - ox
        v1 = pc1[..., 1] / np.maximum(z1, 1e-6) * fy + cy - oy
        ti = (v1 // 8).astype(np.int32)
        tj = (u1 // 8).astype(np.int32)
        cell_valid[b] = (
            finite
            & (z1 > 0.5)
            & (ti >= 0)
            & (ti < hc)
            & (tj >= 0)
            & (tj < wc)
        )
        cell_tgt[b, ..., 0] = np.clip(ti, 0, hc - 1)
        cell_tgt[b, ..., 1] = np.clip(tj, 0, wc - 1)

    return TrainBatchSub(
        h=TrainBatchH(
            img0=jnp.asarray(img0),
            img1=jnp.asarray(img1),
            labels0=jnp.asarray(labels0),
            labels1=jnp.asarray(labels1),
            cell_tgt=jnp.asarray(cell_tgt),
            cell_valid=jnp.asarray(cell_valid),
        ),
        sub0=jnp.asarray(sub0),
        subv0=jnp.asarray(labels0 != 64),
    )


def homography_pool_batch(
    rng: np.random.Generator,
    pool: dict,
    batch: int = 16,
    hw: tuple[int, int] = (320, 640),
    strength: float = 0.10,
) -> TrainBatchSub:
    """Homography pairs over pool crops with the SIFT-teacher labels.

    Complements vo_pair_batch: big synthetic viewpoint changes (the
    invariance teacher) with label consistency — view 0 labels slice
    from the pool's SIFT labels; view 1 labels re-use view 0's through
    the warp (the warped keypoint stays the cell's strongest)."""
    from visualodometry_tpu.models.train_superpoint_textured import (
        _random_homography,
        _warp,
    )

    H, W = hw
    hc, wc = H // 8, W // 8
    imgs, labels = pool["imgs"], pool["labels"]
    labels_sub = pool["labels_sub"]
    FH, FW = imgs.shape[1:]
    img0 = np.zeros((batch, H, W), np.float32)
    img1 = np.zeros((batch, H, W), np.float32)
    labels0 = np.zeros((batch, hc, wc), np.int32)
    labels1 = np.zeros((batch, hc, wc), np.int32)
    sub0 = np.zeros((batch, hc, wc, 2), np.float32)
    cell_tgt = np.zeros((batch, hc, wc, 2), np.int32)
    cell_valid = np.zeros((batch, hc, wc), bool)
    ci = (np.arange(hc) * 8 + 3.5)[:, None]
    cj = (np.arange(wc) * 8 + 3.5)[None, :]
    n = len(imgs)
    for b in range(batch):
        f = int(rng.integers(0, n))
        oy = int(rng.integers(0, max((FH - H) // 8, 1))) * 8
        ox = int(rng.integers(0, max((FW - W) // 8, 1))) * 8
        base = imgs[f, oy : oy + H, ox : ox + W].copy()
        lab = labels[f, oy // 8 : oy // 8 + hc, ox // 8 : ox // 8 + wc]
        Hmat = _random_homography(rng, H, W, strength)
        view1 = _warp(base, Hmat)
        img0[b] = _jitter(rng, base)
        img1[b] = _jitter(rng, view1)
        labels0[b] = lab
        sub0[b] = labels_sub[
            f, oy // 8 : oy // 8 + hc, ox // 8 : ox // 8 + wc
        ]

        # warp the label keypoints (cell + sub-cell offset) through H
        have = lab != 64
        iy, ix = np.nonzero(have)
        sub = lab[iy, ix]
        px = ix * 8.0 + (sub % 8)
        py = iy * 8.0 + (sub // 8)
        w = Hmat[2, 0] * px + Hmat[2, 1] * py + Hmat[2, 2]
        qx = (Hmat[0, 0] * px + Hmat[0, 1] * py + Hmat[0, 2]) / w
        qy = (Hmat[1, 0] * px + Hmat[1, 1] * py + Hmat[1, 2]) / w
        lab1 = np.full((hc, wc), 64, np.int32)
        ok = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)
        qxi = np.clip(np.round(qx[ok]).astype(int), 0, W - 1)
        qyi = np.clip(np.round(qy[ok]).astype(int), 0, H - 1)
        lab1[qyi // 8, qxi // 8] = (qyi % 8) * 8 + (qxi % 8)
        labels1[b] = lab1

        pxc = Hmat[0, 0] * cj + Hmat[0, 1] * ci + Hmat[0, 2]
        pyc = Hmat[1, 0] * cj + Hmat[1, 1] * ci + Hmat[1, 2]
        pwc = Hmat[2, 0] * cj + Hmat[2, 1] * ci + Hmat[2, 2]
        u1, v1 = pxc / pwc, pyc / pwc
        ti = (v1 // 8).astype(np.int32)
        tj = (u1 // 8).astype(np.int32)
        cell_valid[b] = (ti >= 0) & (ti < hc) & (tj >= 0) & (tj < wc)
        cell_tgt[b, ..., 0] = np.clip(ti, 0, hc - 1)
        cell_tgt[b, ..., 1] = np.clip(tj, 0, wc - 1)

    return TrainBatchSub(
        h=TrainBatchH(
            img0=jnp.asarray(img0),
            img1=jnp.asarray(img1),
            labels0=jnp.asarray(labels0),
            labels1=jnp.asarray(labels1),
            cell_tgt=jnp.asarray(cell_tgt),
            cell_valid=jnp.asarray(cell_valid),
        ),
        sub0=jnp.asarray(sub0),
        subv0=jnp.asarray(labels0 != 64),
    )
