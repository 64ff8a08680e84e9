#!/usr/bin/env python
"""Stage-by-stage timing of the BA solver on the chip.

Usage: python scripts/profile_ba.py [P] [L] [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

P = int(sys.argv[1]) if len(sys.argv) > 1 else 20
L = int(sys.argv[2]) if len(sys.argv) > 2 else 5120
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def scan_time(body, init_carry, label="", iters=ITERS):
    @jax.jit
    def run(c0):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, c0, None, length=iters)
        return c

    c = jax.block_until_ready(run(init_carry))
    t0 = time.perf_counter()
    jax.block_until_ready(run(c))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label}: {dt:.3f} ms/iter", flush=True)
    return dt


def main():
    from visualodometry_tpu.ba.solver import (
        BAProblem,
        _residuals_jacobians_lanes as _residuals_jacobians,
        ba_iteration,
        landmark_contributions,
        reduced_solve,
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

    def full_iter(p):
        return ba_iteration(p, damping)

    scan_time(full_iter, prob, label="ba_iteration full")

    def contrib_body(p):
        c = landmark_contributions(p.T_cw, p.X, p.uv, p.mask, p.K, damping)
        # perturb X by a scalar derived from the contribution to carry a dep
        dx = jnp.sum(c.rhs) * 1e-12
        return p._replace(X=p.X + dx)

    scan_time(contrib_body, prob, label="landmark_contributions")

    def rj_body(p):
        r, A, B, m = _residuals_jacobians(p.T_cw, p.X, p.uv, p.mask, p.K)
        dx = jnp.sum(r) * 1e-12 + jnp.sum(A[..., 0, 0]) * 1e-12
        return p._replace(X=p.X + dx)

    scan_time(rj_body, prob, label="  residuals+jacobians")

    # Vinv alone
    V0 = jnp.asarray(rng.random((L, 3, 3), np.float32))
    V0 = jnp.einsum("lij,lkj->lik", V0, V0) + 0.1 * jnp.eye(3)

    def vinv_body(V):
        Vi = jnp.linalg.inv(V)
        return V + jnp.sum(Vi) * 1e-12

    scan_time(vinv_body, V0, label="  jnp.linalg.inv (L,3,3)")

    # S einsum alone
    c0 = landmark_contributions(
        prob.T_cw, prob.X, prob.uv, prob.mask, prob.K, damping
    )
    WVinv0 = jax.block_until_ready(
        jnp.einsum("pkjl,jil->pkil", c0.W, c0.Vinv)
    )

    def s_body(wv):
        S = -jnp.einsum("pkil,qmil->pqkm", wv, c0.W, precision="highest")
        return wv + jnp.sum(S) * 1e-12

    scan_time(s_body, WVinv0, label="  S einsum (lpki,lqmi->pqkm)")

    # reduced solve alone
    S0 = jax.block_until_ready(c0.S)

    def solve_body(S):
        d = reduced_solve(S, c0.rhs, damping, 2)
        return S + jnp.sum(d) * 1e-12

    scan_time(solve_body, S0, label="  reduced_solve (120x120)")


if __name__ == "__main__":
    main()
