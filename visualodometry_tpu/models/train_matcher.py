"""Synthetic training for the attention matcher.

The released LightGlue weights are unfetchable here, so the matcher is
trained on synthetic correspondence problems that mirror what the VO
frontend produces: two keypoint sets with a planted subset of true pairs
(noisy descriptor twins, geometrically consistent displaced positions),
distractors, dropped points, and invalid padding slots. The loss is the
standard dual-softmax assignment cross-entropy plus a matchability BCE —
the same supervision family LightGlue uses, minus its homography/MegaDepth
data (which needs real images).

Starting from the identity-residual init (= mutual-NN dual-softmax), any
improvement the attention layers learn — using positional consistency and
context that plain NN matching cannot — is pure gain for the VO matcher.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from visualodometry_tpu.models.attention_matcher import AttentionMatcher

_NEG = -1e9


class MatchBatch(NamedTuple):
    kps0: jnp.ndarray  # (B, N, 2) normalized [-1, 1]
    desc0: jnp.ndarray  # (B, N, D)
    valid0: jnp.ndarray  # (B, N)
    kps1: jnp.ndarray
    desc1: jnp.ndarray
    valid1: jnp.ndarray
    gt_idx: jnp.ndarray  # (B, N) target index in set 1, -1 = unmatched


def synthetic_match_batch(
    rng: np.random.Generator,
    batch: int = 8,
    n: int = 128,
    d: int = 128,
    pair_frac: float = 0.6,
    desc_noise: float = 0.25,
    pos_noise: float = 0.01,
    flow_scale: float = 0.15,
) -> MatchBatch:
    """Planted-correspondence problems with a smooth coherent flow field."""
    k0 = rng.uniform(-1, 1, (batch, n, 2)).astype(np.float32)
    base = rng.normal(size=(batch, n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)

    n_pairs = int(pair_frac * n)
    gt = np.full((batch, n), -1, np.int32)

    k1 = rng.uniform(-1, 1, (batch, n, 2)).astype(np.float32)
    d1 = rng.normal(size=(batch, n, d)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)

    for b in range(batch):
        perm = rng.permutation(n)[:n_pairs]
        # coherent smooth flow: global translation + small rotation
        t = rng.uniform(-flow_scale, flow_scale, 2)
        ang = rng.uniform(-0.05, 0.05)
        c, s = np.cos(ang), np.sin(ang)
        Rm = np.array([[c, -s], [s, c]], np.float32)
        moved = k0[b, :n_pairs] @ Rm.T + t
        k1[b, perm] = moved + rng.normal(0, pos_noise, (n_pairs, 2))
        d1[b, perm] = base[b, :n_pairs] + desc_noise * rng.normal(
            size=(n_pairs, d)
        )
        d1[b, perm] /= np.linalg.norm(d1[b, perm], axis=-1, keepdims=True)
        gt[b, :n_pairs] = perm

    d0 = base + desc_noise * rng.normal(size=base.shape).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)

    valid0 = np.ones((batch, n), bool)
    valid1 = np.ones((batch, n), bool)
    # drop some slots (padding realism); drops invalidate their gt pairs
    for b in range(batch):
        k0_drop = rng.choice(n, n // 8, replace=False)
        k1_drop = rng.choice(n, n // 8, replace=False)
        valid0[b, k0_drop] = False
        valid1[b, k1_drop] = False
        gt[b, k0_drop] = -1
        in_dropped = np.isin(gt[b], k1_drop)
        gt[b, in_dropped] = -1

    return MatchBatch(
        kps0=jnp.asarray(k0),
        desc0=jnp.asarray(d0.astype(np.float32)),
        valid0=jnp.asarray(valid0),
        kps1=jnp.asarray(k1),
        desc1=jnp.asarray(d1.astype(np.float32)),
        valid1=jnp.asarray(valid1),
        gt_idx=jnp.asarray(gt),
    )


def matcher_loss(params, model: AttentionMatcher, batch: MatchBatch):
    def one(kps0, desc0, v0, kps1, desc1, v1, gt):
        sim, m0, m1 = model.apply(params, kps0, desc0, v0, kps1, desc1, v1)
        sim = jnp.where(v1[None, :], sim, _NEG)
        sim = jnp.where(v0[:, None], sim, _NEG)
        logp = jax.nn.log_softmax(sim, axis=1)
        has_gt = gt >= 0
        gt_c = jnp.clip(gt, 0, sim.shape[1] - 1)
        ce = -jnp.take_along_axis(logp, gt_c[:, None], 1)[:, 0]
        assign_loss = jnp.sum(jnp.where(has_gt, ce, 0.0)) / jnp.maximum(
            jnp.sum(has_gt), 1
        )
        # matchability: predict whether a point has a partner
        target0 = has_gt.astype(jnp.float32)
        bce = -(
            target0 * jnp.log(m0 + 1e-6)
            + (1 - target0) * jnp.log(1 - m0 + 1e-6)
        )
        match_loss = jnp.sum(jnp.where(v0, bce, 0.0)) / jnp.maximum(
            jnp.sum(v0), 1
        )
        return assign_loss + 0.5 * match_loss

    losses = jax.vmap(one)(
        batch.kps0, batch.desc0, batch.valid0,
        batch.kps1, batch.desc1, batch.valid1, batch.gt_idx,
    )
    return jnp.mean(losses)


def matcher_loss_deep(params, model: AttentionMatcher, batch: MatchBatch):
    """Deep-supervision loss for the v2 adaptive matcher.

    LightGlue's training recipe shape: every layer's heads predict the
    assignment (CE) and matchability (BCE), weighted toward the deeper
    layers; each non-final layer's confidence classifier is trained
    (BCE) to predict whether the point's CURRENT argmax equals the FINAL
    layer's argmax — the signal the adaptive inference path
    (`adaptive_match`) uses for early exit and width pruning.
    """

    def one(kps0, desc0, v0, kps1, desc1, v1, gt):
        outs = model.apply(
            params, kps0, desc0, v0, kps1, desc1, v1, method="all_layers"
        )
        L = len(outs)

        def masked(sim):
            sim = jnp.where(v1[None, :], sim, _NEG)
            return jnp.where(v0[:, None], sim, _NEG)

        final_sim = masked(outs[-1][0])
        fin0 = jnp.argmax(final_sim, axis=1)  # (N0,) final row argmax
        fin1 = jnp.argmax(final_sim, axis=0)  # (N1,)
        fin0 = jax.lax.stop_gradient(fin0)
        fin1 = jax.lax.stop_gradient(fin1)

        has_gt = gt >= 0
        gt_c = jnp.clip(gt, 0, final_sim.shape[1] - 1)
        target0 = has_gt.astype(jnp.float32)

        def bce(p, t):
            return -(
                t * jnp.log(p + 1e-6) + (1 - t) * jnp.log(1 - p + 1e-6)
            )

        total = 0.0
        w_sum = 0.0
        for layer, (sim_raw, m0, m1, c0, c1) in enumerate(outs):
            w = (layer + 1) / L
            sim = masked(sim_raw)
            logp = jax.nn.log_softmax(sim, axis=1)
            ce = -jnp.take_along_axis(logp, gt_c[:, None], 1)[:, 0]
            assign = jnp.sum(jnp.where(has_gt, ce, 0.0)) / jnp.maximum(
                jnp.sum(has_gt), 1
            )
            mloss = jnp.sum(jnp.where(v0, bce(m0, target0), 0.0)) / (
                jnp.maximum(jnp.sum(v0), 1)
            )
            total = total + w * (assign + 0.5 * mloss)
            w_sum = w_sum + w
            if layer < L - 1:
                # confidence: does this layer's argmax already agree
                # with the final layer's? (per point, both sides)
                agree0 = (
                    jnp.argmax(sim, axis=1) == fin0
                ).astype(jnp.float32)
                agree1 = (
                    jnp.argmax(sim, axis=0) == fin1
                ).astype(jnp.float32)
                closs = (
                    jnp.sum(jnp.where(v0, bce(c0, agree0), 0.0))
                    + jnp.sum(jnp.where(v1, bce(c1, agree1), 0.0))
                ) / jnp.maximum(jnp.sum(v0) + jnp.sum(v1), 1)
                total = total + 0.25 * closs
        return total / w_sum

    losses = jax.vmap(one)(
        batch.kps0, batch.desc0, batch.valid0,
        batch.kps1, batch.desc1, batch.valid1, batch.gt_idx,
    )
    return jnp.mean(losses)


def evaluate(params, model, batch: MatchBatch, threshold=0.2):
    """Precision/recall of the assignment on a batch."""
    from visualodometry_tpu.models.attention_matcher import (
        assignment_from_scores,
    )

    tp = fp = fn = 0
    for b in range(batch.kps0.shape[0]):
        sim, m0, m1 = model.apply(
            params,
            batch.kps0[b], batch.desc0[b], batch.valid0[b],
            batch.kps1[b], batch.desc1[b], batch.valid1[b],
        )
        res = assignment_from_scores(
            sim, m0, m1, batch.valid0[b], batch.valid1[b], threshold=threshold
        )
        idx = np.asarray(res.idx)
        ok = np.asarray(res.valid)
        gt = np.asarray(batch.gt_idx[b])
        for i in range(len(idx)):
            if ok[i]:
                if gt[i] == idx[i]:
                    tp += 1
                else:
                    fp += 1
            elif gt[i] >= 0:
                fn += 1
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return precision, recall


def train_matcher(
    steps: int = 200,
    batch: int = 8,
    n: int = 128,
    d: int = 128,
    depth: int = 4,
    lr: float = 1e-4,
    seed: int = 0,
    log_every: int = 50,
):
    """Train from identity-residual init; returns (model, params, losses)."""
    model = AttentionMatcher(depth=depth)
    rng = np.random.default_rng(seed)
    b0 = synthetic_match_batch(rng, batch=1, n=n, d=d)
    params = model.init(
        jax.random.key(seed),
        b0.kps0[0], b0.desc0[0], b0.valid0[0],
        b0.kps1[0], b0.desc1[0], b0.valid1[0],
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(matcher_loss)(params, model, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        # curriculum over descriptor ambiguity: easy to near-random twins
        noise = float(rng.uniform(0.15, 0.5))
        b = synthetic_match_batch(rng, batch=batch, n=n, d=d, desc_noise=noise)
        params, opt_state, loss = step(params, opt_state, b)
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
    return model, params, losses
