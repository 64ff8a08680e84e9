"""Attention-based sparse feature matcher (LightGlue architecture class).

TPU replacement for the LightGlue transformer matcher the reference uses
(reference: src/modules/frontend.py:23,81-84; Lindenberger et al.,
"LightGlue: Local Feature Matching at Light Speed"). L blocks of masked
self- and cross-attention over the two keypoint sets with MLP positional
encodings, followed by a dual-softmax assignment gated by per-point
matchability — all fixed-shape and padded, so the whole matcher is one
XLA program dominated by MXU matmuls.

Residual-identity initialization: every attention/MLP output projection
starts at zero and the final similarity projection at identity, so an
*untrained* matcher reduces exactly to temperature-scaled dual-softmax
mutual-nearest matching on the input descriptors — functional from step
zero (pretrained-weight conversion can then only improve it; the build
environment has no network access to fetch the released weights).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from visualodometry_tpu.frontend.matcher import MatchResult

_NEG = -1e9


class _Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, kv_mask):
        h = self.heads
        dh = self.dim // h
        q = nn.Dense(self.dim, name="q")(q_in).reshape(-1, h, dh)
        k = nn.Dense(self.dim, name="k")(kv_in).reshape(-1, h, dh)
        v = nn.Dense(self.dim, name="v")(kv_in).reshape(-1, h, dh)
        logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(float(dh))
        logits = jnp.where(kv_mask[None, None, :], logits, _NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", attn, v).reshape(-1, self.dim)
        # zero-init output projection -> residual identity at init
        return nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros, name="proj"
        )(out)


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x0, x1, m0, m1):
        sa = _Attention(self.dim, self.heads, name="self_attn")
        ca = _Attention(self.dim, self.heads, name="cross_attn")
        x0 = x0 + sa(x0, x0, m0)
        x1 = x1 + sa(x1, x1, m1)
        x0n, x1n = x0, x1
        x0 = x0 + ca(x0n, x1n, m1)
        x1 = x1 + ca(x1n, x0n, m0)

        mlp = nn.Sequential(
            [
                nn.Dense(2 * self.dim),
                nn.gelu,
                nn.Dense(self.dim, kernel_init=nn.initializers.zeros),
            ]
        )
        x0 = x0 + mlp(x0)
        x1 = x1 + mlp(x1)
        return x0, x1


class AttentionMatcher(nn.Module):
    dim: int = 256
    heads: int = 4
    depth: int = 6
    temperature: float = 0.05

    @nn.compact
    def __call__(self, kps0, desc0, valid0, kps1, desc1, valid1):
        """Normalized kps (N, 2) in [-1, 1], descriptors (N, D), masks (N,).

        Returns (scores (N0, N1), matchability0 (N0,), matchability1 (N1,)).
        """
        # input projection starts at identity when D == dim
        d_in = desc0.shape[-1]
        if d_in == self.dim:
            kinit = lambda *a: jnp.eye(self.dim)
        else:
            kinit = nn.initializers.lecun_normal()
        proj_in = nn.Dense(self.dim, kernel_init=kinit, name="in_proj")
        x0 = proj_in(desc0)
        x1 = proj_in(desc1)

        # positional encoding (zero-init output: silent at init)
        pos = nn.Sequential(
            [
                nn.Dense(64),
                nn.gelu,
                nn.Dense(self.dim, kernel_init=nn.initializers.zeros),
            ]
        )
        x0 = x0 + pos(kps0)
        x1 = x1 + pos(kps1)

        for i in range(self.depth):
            x0, x1 = _Block(self.dim, self.heads, name=f"block{i}")(
                x0, x1, valid0, valid1
            )

        out = nn.Dense(
            self.dim,
            kernel_init=(lambda *a: jnp.eye(self.dim)),
            use_bias=False,
            name="out_proj",
        )
        z0 = out(x0)
        z1 = out(x1)
        sim = jnp.einsum("nd,md->nm", z0, z1) / self.temperature

        # matchability: starts at sigmoid(2.0) ~ 0.88 for everything
        match_head = nn.Dense(
            1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(2.0),
            name="matchability",
        )
        m0 = jax.nn.sigmoid(match_head(x0))[:, 0]
        m1 = jax.nn.sigmoid(match_head(x1))[:, 0]
        return sim, m0, m1


def assignment_from_scores(
    sim: jnp.ndarray,
    m0: jnp.ndarray,
    m1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    threshold: float = 0.2,
) -> MatchResult:
    """Dual-softmax + mutual-argmax assignment (fixed shape).

    score_ij = softmax_row(sim)_ij * softmax_col(sim)_ij * m0_i * m1_j;
    a pair matches iff it is the mutual argmax and scores above threshold.
    """
    sim = jnp.where(valid1[None, :], sim, _NEG)
    sim = jnp.where(valid0[:, None], sim, _NEG)
    p_row = jax.nn.softmax(sim, axis=1)
    p_col = jax.nn.softmax(sim, axis=0)
    scores = p_row * p_col * m0[:, None] * m1[None, :]

    best_j = jnp.argmax(scores, axis=1)  # (N0,)
    best_i = jnp.argmax(scores, axis=0)  # (N1,)
    mutual = best_i[best_j] == jnp.arange(sim.shape[0])
    top = jnp.take_along_axis(scores, best_j[:, None], axis=1)[:, 0]
    ok = valid0 & mutual & (top > threshold)
    return MatchResult(idx=best_j.astype(jnp.int32), valid=ok)


def normalize_kps(kps: jnp.ndarray, image_size) -> jnp.ndarray:
    """Pixel coords -> [-1, 1]^2 given (W, H)."""
    wh = jnp.asarray(image_size, jnp.float32)
    return (kps / wh) * 2.0 - 1.0
