"""NMS-aware training for the dense scoring head (SuperPointDense).

VERDICT r4 #2: the 65-way cell-softmax detector capped frame-to-frame
localization at p50 ~1.5 px (SIFT: 0.18 px) and neither more epochs nor
cell-level subpixel regression closed it — the argmax-of-softmax-cells
selection was never trained as the operator it is at inference. This
module trains the DISK/ALIKED-class dense head (models/superpoint.py::
SuperPointDense) so that the inference-time selection chain — NMS over
the full-res score map, then a 3x3 probability-centroid subpixel
refinement (superpoint.select_keypoints) — lands on the SIFT teacher's
float positions:

1. balanced detection BCE on the score logits: positives at the
   teacher keypoints' rounded pixels, negatives everywhere outside a
   dilated ignore ring (a 1-2 px miss is not a negative — penalizing it
   re-creates the argmax jitter this head exists to remove);
2. localization: the EXACT inference refinement (3x3 sigmoid-prob
   centroid around the rounded teacher pixel) regressed onto the
   teacher's subpixel offset (Huber) — NMS-aware in the literal sense:
   the trained operator IS the deployed operator;
3. descriptor InfoNCE over depth-GT/homography cell correspondences
   (identical to train_superpoint_textured.loss_fn_h's term — the
   descriptor head is unchanged).

Teacher pool + batches come from vo_distill (SIFT-teacher labels with
in-cell subpixel targets, true-parallax VO pairs + homography pairs).
Reference capability this closes: the released SuperPoint checkpoint
the reference loads (src/modules/frontend.py:17-22) localizes well
enough for its VO loop out of the box; the in-repo-trained one must too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visualodometry_tpu.models.superpoint import SuperPointDense
from visualodometry_tpu.models.vo_distill import TrainBatchSub


def _positions_from_labels(labels, sub):
    """Cell labels + in-cell subpixel -> full-res teacher positions.

    labels: (B, Hc, Wc) int32 in [0, 64] (64 = dustbin);
    sub: (B, Hc, Wc, 2) float (x, y) in-cell in [0, 8) — zeros where the
    caller has no subpixel target (then the integer cell-class position
    is used alone).
    Returns pos (B, Hc*Wc, 2) float32 full-res (x, y), valid (B, Hc*Wc).
    """
    B, Hc, Wc = labels.shape
    valid = labels != 64
    lx = (labels % 8).astype(jnp.float32)
    ly = (labels // 8).astype(jnp.float32)
    cj = jnp.arange(Wc, dtype=jnp.float32)[None, None, :]
    ci = jnp.arange(Hc, dtype=jnp.float32)[None, :, None]
    has_sub = jnp.any(sub != 0.0, axis=-1)
    px = jnp.where(has_sub, sub[..., 0], lx) + cj * 8.0
    py = jnp.where(has_sub, sub[..., 1], ly) + ci * 8.0
    pos = jnp.stack([px, py], axis=-1).reshape(B, Hc * Wc, 2)
    return pos, valid.reshape(B, Hc * Wc)


def _detection_bce(score, pos, valid):
    """Balanced BCE with a dilated ignore ring around positives.

    score: (B, H, W) logits; pos: (B, N, 2) float (x, y); valid: (B, N).
    """
    B, H, W = score.shape
    xi = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 0, H - 1)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], xi.shape)
    tgt = jnp.zeros((B, H, W), jnp.float32)
    tgt = tgt.at[bidx, yi, xi].max(valid.astype(jnp.float32))
    # ignore ring: within 2 px of a positive but not ON it
    dil = jax.lax.reduce_window(
        tgt, 0.0, jax.lax.max,
        window_dimensions=(1, 5, 5), window_strides=(1, 1, 1),
        padding=((0, 0), (2, 2), (2, 2)),
    )
    neg_mask = (dil == 0.0)
    pos_mask = tgt == 1.0
    bce = optax.sigmoid_binary_cross_entropy(score, tgt)
    l_pos = jnp.sum(jnp.where(pos_mask, bce, 0.0)) / jnp.maximum(
        jnp.sum(pos_mask), 1.0
    )
    l_neg = jnp.sum(jnp.where(neg_mask, bce, 0.0)) / jnp.maximum(
        jnp.sum(neg_mask), 1.0
    )
    return l_pos + l_neg


def _localization_loss(score, pos, valid):
    """Huber between the 3x3 sigmoid-prob centroid and the teacher offset.

    Mirrors superpoint.select_keypoints's refinement exactly (window
    centered on the rounded teacher pixel; at inference the NMS argmax
    coincides with it when detection is trained).
    """
    B, H, W = score.shape
    prob = jax.nn.sigmoid(score)
    x0 = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 1, W - 2)
    y0 = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 1, H - 2)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], x0.shape)
    wsum = jnp.zeros(x0.shape, jnp.float32)
    ox = jnp.zeros(x0.shape, jnp.float32)
    oy = jnp.zeros(x0.shape, jnp.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            w = prob[bidx, y0 + di, x0 + dj]
            wsum = wsum + w
            oy = oy + w * di
            ox = ox + w * dj
    wsum = jnp.maximum(wsum, 1e-6)
    pred = jnp.stack([ox, oy], -1) / wsum[..., None]
    tgt = pos - jnp.stack(
        [x0.astype(jnp.float32), y0.astype(jnp.float32)], -1
    )
    err = optax.huber_loss(pred, jnp.clip(tgt, -0.5, 0.5), delta=0.25)
    m = valid[..., None]
    return jnp.sum(jnp.where(m, err, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)


def loss_fn_dense(
    params,
    model: SuperPointDense,
    batch: TrainBatchSub,
    desc_w: float = 2.0,
    loc_w: float = 4.0,
):
    h = batch.h
    score0, desc0 = model.apply(params, h.img0[..., None])
    score1, desc1 = model.apply(params, h.img1[..., None])
    B, hc, wc, _ = desc0.shape

    zeros_sub = jnp.zeros_like(batch.sub0)
    pos0, v0 = _positions_from_labels(h.labels0, batch.sub0)
    v0 = v0 & batch.subv0.reshape(B, -1)
    pos1, v1 = _positions_from_labels(h.labels1, zeros_sub)

    det_loss = 0.5 * (
        _detection_bce(score0, pos0, v0) + _detection_bce(score1, pos1, v1)
    )
    loc_loss = _localization_loss(score0, pos0, v0)

    # symmetric InfoNCE over corresponding cells (loss_fn_h's term)
    bidx = jnp.arange(B)[:, None, None]
    d1_at = desc1[bidx, h.cell_tgt[..., 0], h.cell_tgt[..., 1]]
    d0_flat = desc0.reshape(B, hc * wc, -1)
    d1_flat = d1_at.reshape(B, hc * wc, -1)
    mask = h.cell_valid.reshape(B, hc * wc)
    sim = jnp.einsum("bnd,bmd->bnm", d0_flat, d1_flat) / 0.1
    labels_nce = jnp.arange(hc * wc)[None, :].repeat(B, 0)

    def nce(s):
        logp = jax.nn.log_softmax(s, axis=-1)
        return -jnp.take_along_axis(logp, labels_nce[..., None], -1)[..., 0]

    per_cell = 0.5 * (nce(sim) + nce(sim.transpose(0, 2, 1)))
    desc_loss = jnp.sum(per_cell * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    total = det_loss + loc_w * loc_loss + desc_w * desc_loss
    return total, (det_loss, loc_loss, desc_loss)


def warm_start_dense(key, backbone_params, input_hw=(320, 640)):
    """Init SuperPointDense, copying shared layers from a backbone ckpt.

    Copies conv1a..conv4b (encoder) and convDa/convDb (descriptor head)
    from a SuperPointBackbone checkpoint; the score head stays at its
    fresh init.
    """
    model = SuperPointDense()
    h, w = input_hw
    params = model.init(key, jnp.zeros((1, h, w, 1)))
    src = backbone_params["params"]
    dst = dict(params["params"])
    for name in src:
        if name in dst and not name.startswith("convP"):
            dst[name] = jax.tree.map(jnp.asarray, src[name])
    return model, {"params": dst}


def make_train_step_dense(model, tx, desc_w=2.0, loc_w=4.0):
    def step(params, opt_state, batch: TrainBatchSub):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn_dense, has_aux=True
        )(params, model, batch, desc_w=desc_w, loc_w=loc_w)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step
