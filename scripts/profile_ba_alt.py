#!/usr/bin/env python
"""A/B candidate rewrites of the BA contribution contractions on chip.

The round-3 fine profile (profile_ba_fine.py) showed the per-iteration
cost is NOT FLOPs or bytes: it is XLA lowering tiny-contraction einsums
(V/W/h/WVinv, contraction over p,i or b with L in the OUTPUT) into
dot_generals with relayouts. Candidates here keep L on lanes and express
those contractions as broadcast-multiply-reduce, which XLA fuses into
single-pass VPU loops.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

P = int(sys.argv[1]) if len(sys.argv) > 1 else 20
L = int(sys.argv[2]) if len(sys.argv) > 2 else 5120
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def scan_time(body, init_carry, label="", iters=ITERS):
    @jax.jit
    def run(c0):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, c0, None, length=iters)
        return c

    c = jax.block_until_ready(run(init_carry))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(c))
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    print(f"{label}: {best:.3f} ms/iter", flush=True)
    return best


def main():
    from visualodometry_tpu.ba.solver import (
        BAProblem,
        _inv3_sym_lanes,
        _residuals_jacobians_lanes,
        landmark_contributions,
    )

    rng = np.random.default_rng(0)
    K = jnp.asarray(
        [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]],
        jnp.float32,
    )
    X = np.stack(
        [rng.uniform(-20, 20, L), rng.uniform(-5, 3, L), rng.uniform(8, 60, L)],
        axis=1,
    ).astype(np.float32)
    T_cw = np.broadcast_to(np.eye(4, dtype=np.float32), (P, 4, 4)).copy()
    T_cw[:, 2, 3] = -1.2 * np.arange(P)
    pc = np.einsum("pij,lj->lpi", T_cw[:, :3, :3], X) + T_cw[:, :3, 3]
    uv = pc[..., :2] / np.maximum(pc[..., 2:], 1e-6) * [718.856, 718.856] + [
        607.1928,
        185.2157,
    ]
    mask = pc[..., 2] > 1.0
    prob = BAProblem(
        T_cw=jnp.asarray(T_cw),
        X=jnp.asarray(X + rng.normal(0, 0.1, X.shape).astype(np.float32)),
        uv=jnp.asarray(uv.astype(np.float32)),
        mask=jnp.asarray(mask),
        K=K,
    )
    damping = jnp.float32(1e-4)

    def contrib_fused(T, Xl, uvl, maskl, Kl, damp):
        """Candidate: multiply-reduce contractions, c-sliced S matmuls."""
        r, A, B, m = _residuals_jacobians_lanes(T, Xl, uvl, maskl, Kl)
        w = m.astype(Xl.dtype)
        rw = r * w[:, None, :]  # (P, 2, L)

        # U contracts over lanes — einsum (MXU) is already optimal
        U = jnp.einsum("pial,pibl->pab", A, A, precision="highest")
        g = jnp.einsum("pial,pil->pa", A, rw, precision="highest")

        # V/W/h: contraction over (p, i) with L in the output — fused
        # broadcast-multiply-reduce, never a dot_general
        V = jnp.sum(B[:, :, :, None, :] * B[:, :, None, :, :], axis=(0, 1))
        W = jnp.sum(A[:, :, :, None, :] * B[:, :, None, :, :], axis=1)
        h = jnp.sum(B * rw[:, :, None, :], axis=(0, 1))

        lam = damp + 1e-6
        V = V.at[0, 0].add(lam).at[1, 1].add(lam).at[2, 2].add(lam)
        Vinv = _inv3_sym_lanes(V)

        WVinv = jnp.sum(
            W[:, :, :, None, :] * Vinv[None, None, :, :, :], axis=2
        )  # (P, 6, 3, L)

        # S: 3 clean (120, L) x (L, 120) MXU matmuls (lanes contraction),
        # avoiding the (c, l)-fused reshape relayout
        S = jnp.zeros((P * 6, P * 6), Xl.dtype)
        for c in range(3):
            M1 = WVinv[:, :, c, :].reshape(P * 6, L)
            M2 = W[:, :, c, :].reshape(P * 6, L)
            S = S - jax.lax.dot_general(
                M1, M2, (((1,), (1,)), ((), ())), precision="highest"
            )
        S = S.reshape(P, 6, P, 6).transpose(0, 2, 1, 3)
        S = S.at[jnp.arange(P), jnp.arange(P)].add(U)
        rhs = g - jnp.sum(
            WVinv * h[None, None, :, :], axis=(2, 3)
        )  # (P, 6)
        return S, rhs, Vinv, W, h, jnp.any(m, axis=0)

    # correctness check vs current implementation
    cur = jax.jit(landmark_contributions)(
        prob.T_cw, prob.X, prob.uv, prob.mask, prob.K, damping
    )
    new = jax.jit(contrib_fused)(
        prob.T_cw, prob.X, prob.uv, prob.mask, prob.K, damping
    )
    for name, a, b in [
        ("S", cur.S, new[0]),
        ("rhs", cur.rhs, new[1]),
        ("Vinv", cur.Vinv, new[2]),
        ("W", cur.W, new[3]),
        ("h", cur.h, new[4]),
    ]:
        err = float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30)
        )
        print(f"  parity {name}: rel err {err:.2e}", flush=True)

    def perturb(p, s):
        return p._replace(X=p.X + s * 1e-12)

    def body_cur(p):
        c = landmark_contributions(p.T_cw, p.X, p.uv, p.mask, p.K, damping)
        return perturb(p, jnp.sum(c.rhs))

    def body_new(p):
        S, rhs, Vinv, W, h, seen = contrib_fused(
            p.T_cw, p.X, p.uv, p.mask, p.K, damping
        )
        return perturb(p, jnp.sum(rhs) + jnp.sum(S) * 1e-9)

    scan_time(body_cur, prob, label="contrib CURRENT (einsum)")
    scan_time(body_new, prob, label="contrib FUSED (mul-reduce)")


if __name__ == "__main__":
    main()
