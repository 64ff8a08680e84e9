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

v2 (r4) adds LightGlue's actual speed mechanisms — the reasons it is
"at light speed" (reference: src/modules/frontend.py:23 inherits
`depth_confidence`/`width_confidence` defaults from the pinned package):
  - per-layer assignment/matchability/confidence heads trained with deep
    supervision (`per_layer_heads=True`), so intermediate layers emit
    calibrated predictions;
  - point PRUNING after the first block (`adaptive_match`): keep the
    top-P slots per side by keep-score (matchable or still-uncertain),
    run the remaining blocks and the N^2 assignment at P^2 — a static-
    shape analog of LightGlue's width pruning;
  - EARLY EXIT: after each later block a confidence classifier scores
    how stable each point's current assignment is; when the confident
    fraction clears the exit threshold the remaining blocks are skipped
    via lax.cond (real branch skipping inside one XLA program).
All matmul-heavy compute runs in bf16 on the MXU with f32 accumulation
(`compute_dtype`); params stay f32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from visualodometry_tpu.frontend.matcher import MatchResult

_NEG = -1e9


class _Attention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, kv_mask):
        h = self.heads
        dh = self.dim // h
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(q_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)
        q = q.reshape(-1, h, dh)
        k = k.reshape(-1, h, dh)
        v = v.reshape(-1, h, dh)
        logits = jnp.einsum(
            "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(dh))
        logits = jnp.where(kv_mask[None, None, :], logits, _NEG)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "hqk,khd->qhd", attn, v, preferred_element_type=jnp.float32
        ).reshape(-1, self.dim)
        # zero-init output projection -> residual identity at init
        return nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="proj",
        )(out)


class _Block(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, m0, m1):
        sa = _Attention(self.dim, self.heads, self.dtype, name="self_attn")
        ca = _Attention(self.dim, self.heads, self.dtype, name="cross_attn")
        x0 = x0 + sa(x0, x0, m0)
        x1 = x1 + sa(x1, x1, m1)
        x0n, x1n = x0, x1
        x0 = x0 + ca(x0n, x1n, m1)
        x1 = x1 + ca(x1n, x0n, m0)

        mlp = nn.Sequential(
            [
                nn.Dense(2 * self.dim, dtype=self.dtype),
                nn.gelu,
                nn.Dense(
                    self.dim,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                ),
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
    per_layer_heads: bool = False  # v2: deep supervision + adaptive inference
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # Param-tree naming matches the r2/r3 compact layout exactly
        # (checkpoints load unchanged): pos-enc Dense layers auto-named
        # Dense_0/Dense_1 at the top level; shared (or final-layer)
        # heads named out_proj/matchability.
        d_in_identity = lambda key, shape, dtype=jnp.float32: (
            jnp.eye(self.dim, dtype=dtype)
            if shape[0] == self.dim
            else nn.initializers.lecun_normal()(key, shape, dtype)
        )
        self.in_proj = nn.Dense(
            self.dim, kernel_init=d_in_identity, name="in_proj"
        )
        self.pos_d0 = nn.Dense(64, name="Dense_0")
        self.pos_d1 = nn.Dense(
            self.dim, kernel_init=nn.initializers.zeros, name="Dense_1"
        )
        self.blocks = [
            _Block(
                self.dim, self.heads, self.compute_dtype, name=f"block{i}"
            )
            for i in range(self.depth)
        ]
        n_heads = self.depth if self.per_layer_heads else 1
        last = n_heads - 1
        self.out_projs = [
            nn.Dense(
                self.dim,
                kernel_init=(lambda *a: jnp.eye(self.dim)),
                use_bias=False,
                name="out_proj" if i == last else f"out_proj{i}",
            )
            for i in range(n_heads)
        ]
        self.match_heads = [
            nn.Dense(
                1,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.constant(2.0),
                name="matchability" if i == last else f"matchability{i}",
            )
            for i in range(n_heads)
        ]
        # per-layer confidence classifier (v2 only; LightGlue's depth-
        # adaptivity signal): predicts whether this point's CURRENT
        # assignment equals the final layer's
        if self.per_layer_heads:
            self.conf_heads = [
                nn.Dense(
                    1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name=f"confidence{i}",
                )
                for i in range(self.depth)
            ]

    # ---- composable pieces (used by adaptive_match via method=...) ----
    def pos_enc(self, kps):
        return self.pos_d1(nn.gelu(self.pos_d0(kps)))

    def embed(self, kps0, desc0, kps1, desc1):
        x0 = self.in_proj(desc0) + self.pos_enc(kps0)
        x1 = self.in_proj(desc1) + self.pos_enc(kps1)
        return x0, x1

    def run_block(self, i: int, x0, x1, m0, m1):
        return self.blocks[i](x0, x1, m0, m1)

    def heads_at(self, i: int, x0, x1):
        """(sim, m0, m1) from layer-i embeddings (i=0 when shared)."""
        j = i if self.per_layer_heads else 0
        z0 = self.out_projs[j](x0)
        z1 = self.out_projs[j](x1)
        sim = (
            jnp.einsum("nd,md->nm", z0, z1, preferred_element_type=jnp.float32)
            / self.temperature
        )
        m0 = jax.nn.sigmoid(self.match_heads[j](x0))[:, 0]
        m1 = jax.nn.sigmoid(self.match_heads[j](x1))[:, 0]
        return sim, m0, m1

    def confidence_at(self, i: int, x0, x1):
        c0 = jax.nn.sigmoid(self.conf_heads[i](x0))[:, 0]
        c1 = jax.nn.sigmoid(self.conf_heads[i](x1))[:, 0]
        return c0, c1

    def __call__(self, kps0, desc0, valid0, kps1, desc1, valid1):
        """Full-depth forward. Normalized kps (N, 2) in [-1, 1].

        Returns (scores (N0, N1), matchability0 (N0,), matchability1).
        """
        x0, x1 = self.embed(kps0, desc0, kps1, desc1)
        for i in range(self.depth):
            x0, x1 = self.blocks[i](x0, x1, valid0, valid1)
        return self.heads_at(self.depth - 1, x0, x1)

    def all_layers(self, kps0, desc0, valid0, kps1, desc1, valid1):
        """Per-layer (sim, m0, m1, c0, c1) for deep supervision training."""
        x0, x1 = self.embed(kps0, desc0, kps1, desc1)
        outs = []
        for i in range(self.depth):
            x0, x1 = self.blocks[i](x0, x1, valid0, valid1)
            sim, m0, m1 = self.heads_at(i, x0, x1)
            if self.per_layer_heads:
                c0, c1 = self.confidence_at(i, x0, x1)
            else:
                c0 = jnp.ones_like(m0)
                c1 = jnp.ones_like(m1)
            outs.append((sim, m0, m1, c0, c1))
        return outs


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


def adaptive_match(
    model: AttentionMatcher,
    params,
    kps0,
    desc0,
    valid0,
    kps1,
    desc1,
    valid1,
    prune_to: int = 0,
    exit_conf: float = 0.0,
    threshold: float = 0.2,
) -> MatchResult:
    """LightGlue-style adaptive inference: width pruning + depth exit.

    Requires a `per_layer_heads=True` model/params. Runs block 0 at full
    N, ranks points by keep-score (matchable OR still-uncertain:
    `1 - c*(1-m)`), keeps the static top-`prune_to` per side, runs the
    remaining blocks at P^2, and after each checks the confident
    fraction against `exit_conf` — skipping the rest of the stack via
    lax.cond when assignments have stabilized. Dropped points are exactly
    the ones LightGlue's width pruning discards (confidently
    unmatchable); they return unmatched, as there.

    prune_to=0 disables pruning; exit_conf=0 disables early exit.
    """
    assert model.per_layer_heads, "adaptive_match needs per-layer heads"
    N = desc0.shape[0]
    ap = lambda method, *a: model.apply(params, *a, method=method)

    x0, x1 = ap("embed", kps0, desc0, kps1, desc1)
    x0, x1 = ap("run_block", 0, x0, x1, valid0, valid1)

    if prune_to and prune_to < N:
        P = prune_to
        c0, c1 = ap("confidence_at", 0, x0, x1)
        _, m0, m1 = ap("heads_at", 0, x0, x1)
        keep0 = jnp.where(valid0, 1.0 - c0 * (1.0 - m0), -1.0)
        keep1 = jnp.where(valid1, 1.0 - c1 * (1.0 - m1), -1.0)
        _, idx0 = jax.lax.top_k(keep0, P)
        _, idx1 = jax.lax.top_k(keep1, P)
        x0, x1 = x0[idx0], x1[idx1]
        v0, v1 = valid0[idx0], valid1[idx1]
    else:
        idx0 = idx1 = None
        v0, v1 = valid0, valid1

    sim, m0, m1 = ap("heads_at", 0, x0, x1)
    done = jnp.asarray(False)
    for i in range(1, model.depth):

        def run(carry, i=i):
            x0, x1, _sim, _m0, _m1, _ = carry
            x0, x1 = ap("run_block", i, x0, x1, v0, v1)
            sim, m0, m1 = ap("heads_at", i, x0, x1)
            if exit_conf > 0.0 and i < model.depth - 1:
                c0, c1 = ap("confidence_at", i, x0, x1)
                conf = jnp.concatenate([c0, c1])
                vcat = jnp.concatenate([v0, v1])
                frac = jnp.sum(
                    jnp.where(vcat, (conf > 0.95).astype(jnp.float32), 0.0)
                ) / jnp.maximum(jnp.sum(vcat.astype(jnp.float32)), 1.0)
                done = frac > exit_conf
            else:
                done = jnp.asarray(False)
            return (x0, x1, sim, m0, m1, done)

        def skip(carry):
            return carry

        x0, x1, sim, m0, m1, done = jax.lax.cond(
            done, skip, run, (x0, x1, sim, m0, m1, done)
        )

    res = assignment_from_scores(sim, m0, m1, v0, v1, threshold)
    if idx0 is None:
        return res
    # scatter the P-space assignment back to the N-space slots
    out_idx = jnp.zeros((N,), jnp.int32)
    out_valid = jnp.zeros((N,), bool)
    out_idx = out_idx.at[idx0].set(idx1[res.idx].astype(jnp.int32))
    out_valid = out_valid.at[idx0].set(res.valid)
    return MatchResult(idx=out_idx, valid=out_valid)


def normalize_kps(kps: jnp.ndarray, image_size) -> jnp.ndarray:
    """Pixel coords -> [-1, 1]^2 given (W, H)."""
    wh = jnp.asarray(image_size, jnp.float32)
    return (kps / wh) * 2.0 - 1.0
