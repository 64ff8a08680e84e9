"""Synthetic pretraining for the Flax SuperPoint (MagicPoint recipe).

The released SuperPoint weights cannot be downloaded in this environment,
so we do what the original authors did first: pretrain on synthetic
geometric images with exactly known interest points (DeTone et al. —
MagicPoint stage), plus a descriptor-contrastive term over homography-
related views, entirely on-device:

- detector head: per-8x8-cell 65-way cross entropy (64 positions +
  dustbin) against rendered blob/corner ground truth;
- descriptor head: InfoNCE between cell descriptors of two views related
  by a known shift (positives = corresponding cells).

`make_train_step` returns a jitted (optionally pmapped/mesh-sharded)
training step — also used by __graft_entry__.dryrun_multichip as the
literal "training step over the mesh" (gradients psum across the data-
parallel axis).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from visualodometry_tpu.models.superpoint import SuperPointBackbone


class TrainBatch(NamedTuple):
    img0: jnp.ndarray  # (B, H, W)
    img1: jnp.ndarray  # (B, H, W) shifted view
    labels0: jnp.ndarray  # (B, Hc, Wc) int32 cell class in [0, 64]
    shift: jnp.ndarray  # (B, 2) integer (dx, dy) of view 1 vs view 0


def synthetic_batch(
    rng: np.random.Generator,
    batch: int = 16,
    hw: tuple[int, int] = (96, 128),
    n_points: int = 24,
    max_shift: int = 24,
) -> TrainBatch:
    """Random blob images with known keypoints + shifted second views."""
    H, W = hw
    hc, wc = H // 8, W // 8
    labels = np.full((batch, hc, wc), 64, np.int32)  # dustbin default
    shifts = rng.integers(-max_shift, max_shift + 1, (batch, 2)).astype(
        np.int32
    )
    margin = max_shift + 6
    px = rng.uniform(margin, W - margin, (batch, n_points)).astype(np.float32)
    py = rng.uniform(margin, H - margin, (batch, n_points)).astype(np.float32)
    sig = rng.uniform(1.0, 2.2, (batch, n_points)).astype(np.float32)
    amp = rng.uniform(0.4, 1.0, (batch, n_points)).astype(np.float32)

    yy = np.arange(H, dtype=np.float32)[None, None, :, None]
    xx = np.arange(W, dtype=np.float32)[None, None, None, :]

    def render(cx, cy):
        # (B, P, H, W) blob field -> max over P
        d2 = (xx - cx[:, :, None, None]) ** 2 + (yy - cy[:, :, None, None]) ** 2
        return (
            amp[:, :, None, None]
            * np.exp(-d2 / (2 * sig[:, :, None, None] ** 2))
        ).max(axis=1)

    imgs0 = render(px, py)
    imgs1 = render(
        px + shifts[:, 0:1].astype(np.float32),
        py + shifts[:, 1:2].astype(np.float32),
    )
    imgs0 = np.clip(
        imgs0 + rng.normal(0, 0.02, imgs0.shape), 0, 1
    ).astype(np.float32)
    imgs1 = np.clip(
        imgs1 + rng.normal(0, 0.02, imgs1.shape), 0, 1
    ).astype(np.float32)

    cxi = np.clip(np.round(px).astype(np.int64), 0, W - 1)
    cyi = np.clip(np.round(py).astype(np.int64), 0, H - 1)
    bidx = np.repeat(np.arange(batch), n_points)
    labels[bidx, cyi.ravel() // 8, cxi.ravel() // 8] = (
        (cyi.ravel() % 8) * 8 + cxi.ravel() % 8
    )
    return TrainBatch(
        img0=jnp.asarray(imgs0),
        img1=jnp.asarray(imgs1),
        labels0=jnp.asarray(labels),
        shift=jnp.asarray(shifts),
    )


def loss_fn(params, model: SuperPointBackbone, batch: TrainBatch, desc_w=1.0):
    det0, desc0 = model.apply(params, batch.img0[..., None])
    det1, desc1 = model.apply(params, batch.img1[..., None])
    B, hc, wc, _ = det0.shape

    # ---- detector CE on view 0 ----
    logp = jax.nn.log_softmax(det0, axis=-1)
    onehot = jax.nn.one_hot(batch.labels0, 65, dtype=logp.dtype)
    det_loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    # ---- descriptor InfoNCE between corresponding cells ----
    # cell (i, j) of view 0 corresponds to cell (i + dy/8, j + dx/8) of
    # view 1 when the shift is cell-aligned; round to nearest cell.
    dcell = jnp.round(batch.shift.astype(jnp.float32) / 8.0).astype(jnp.int32)
    ii = jnp.arange(hc)[None, :, None]  # (1, hc, 1)
    jj = jnp.arange(wc)[None, None, :]
    ti = ii + dcell[:, 1][:, None, None]
    tj = jj + dcell[:, 0][:, None, None]
    in_bounds = (ti >= 0) & (ti < hc) & (tj >= 0) & (tj < wc)
    ti_c = jnp.clip(ti, 0, hc - 1)
    tj_c = jnp.clip(tj, 0, wc - 1)
    bidx = jnp.arange(B)[:, None, None]
    d1_at = desc1[bidx, ti_c, tj_c]  # (B, hc, wc, 256)

    d0_flat = desc0.reshape(B, hc * wc, -1)
    d1_flat = d1_at.reshape(B, hc * wc, -1)
    mask = in_bounds.reshape(B, hc * wc)
    sim = jnp.einsum("bnd,bmd->bnm", d0_flat, d1_flat) / 0.1
    labels_nce = jnp.arange(hc * wc)[None, :].repeat(B, 0)
    logp_nce = jax.nn.log_softmax(sim, axis=-1)
    nce = -jnp.take_along_axis(logp_nce, labels_nce[..., None], -1)[..., 0]
    desc_loss = jnp.sum(nce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    return det_loss + desc_w * desc_loss, (det_loss, desc_loss)


def make_train_step(model: SuperPointBackbone, tx, axis_name: str | None = None):
    """Jittable train step; psums grads over `axis_name` when given."""

    def step(params, opt_state, batch: TrainBatch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model, batch
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def pretrain(
    steps: int = 300,
    batch: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
    hw: tuple[int, int] = (96, 128),
    log_every: int = 50,
):
    """Run synthetic pretraining; returns (model, params, losses)."""
    model = SuperPointBackbone()
    rng = np.random.default_rng(seed)
    params = model.init(
        jax.random.key(seed), jnp.zeros((1, hw[0], hw[1], 1))
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx))

    losses = []
    for i in range(steps):
        b = synthetic_batch(rng, batch=batch, hw=hw)
        params, opt_state, loss, aux = train_step(params, opt_state, b)
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
    return model, params, losses


def save_params(params, path):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)


def load_params(path):
    import pickle

    with open(path, "rb") as f:
        import jax.numpy as jnp

        return jax.tree.map(jnp.asarray, pickle.load(f))
