#!/usr/bin/env python
"""Fine-grained in-graph timing of BA iteration sub-stages on the chip.

Each candidate body runs inside one jitted lax.scan so per-dispatch
tunnel noise is amortized; a scalar derived from the output is folded
back into the carry to defeat DCE and re-dispatch caching.

Usage: python scripts/profile_ba_fine.py [P] [L] [iters]
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

    def perturb(p, s):
        return p._replace(X=p.X + s * 1e-12)

    # --- stage bodies ---------------------------------------------------
    def rj_body(p):
        r, A, B, m = _residuals_jacobians_lanes(p.T_cw, p.X, p.uv, p.mask, p.K)
        return perturb(p, jnp.sum(r) + jnp.sum(A[:, 0, 0]) + jnp.sum(B[:, 0, 0]))

    scan_time(rj_body, prob, label="residuals+jacobians (r,A,B,m)")

    # pre-materialize A, B, r once; time each downstream contraction
    r0, A0, B0, m0 = jax.block_until_ready(
        jax.jit(_residuals_jacobians_lanes)(prob.T_cw, prob.X, prob.uv, prob.mask, prob.K)
    )
    w0 = m0.astype(jnp.float32)
    rw0 = r0 * w0[:, None, :]

    def u_body(A):
        U = jnp.einsum("pial,pibl->pab", A, A, precision="highest")
        return A + jnp.sum(U) * 1e-12

    scan_time(u_body, A0, label="  U einsum (P,6,6)")

    def vwh_body(carry):
        A, B = carry
        V = jnp.einsum("pial,pibl->abl", B, B, precision="highest")
        W = jnp.einsum("pial,pibl->pabl", A, B, precision="highest")
        h = jnp.einsum("pial,pil->al", B, rw0, precision="highest")
        s = jnp.sum(V) + jnp.sum(W[:, 0, 0]) + jnp.sum(h)
        return (A + s * 1e-12, B)

    scan_time(vwh_body, (A0, B0), label="  V+W+h einsums")

    # pre-materialize W, Vinv
    V0 = jnp.einsum("pial,pibl->abl", B0, B0, precision="highest")
    V0 = V0.at[0, 0].add(1e-4).at[1, 1].add(1e-4).at[2, 2].add(1e-4)
    Vinv0 = jax.block_until_ready(jax.jit(_inv3_sym_lanes)(V0))
    W0 = jax.block_until_ready(
        jnp.einsum("pial,pibl->pabl", A0, B0, precision="highest")
    )

    def vinv_body(V):
        Vi = _inv3_sym_lanes(V)
        return V + jnp.sum(Vi) * 1e-12

    scan_time(vinv_body, V0, label="  Vinv adjugate (3,3,L)")

    def wv_body(W):
        WVinv = jnp.einsum("pabl,bcl->pacl", W, Vinv0, precision="highest")
        return W + jnp.sum(WVinv[:, 0, 0]) * 1e-12

    scan_time(wv_body, W0, label="  WVinv einsum (P,6,3,L)")

    WVinv0 = jax.block_until_ready(
        jnp.einsum("pabl,bcl->pacl", W0, Vinv0, precision="highest")
    )

    def s_body(wv):
        M1 = wv.reshape(P * 6, 3 * L)
        M2 = W0.reshape(P * 6, 3 * L)
        S = -jax.lax.dot_general(
            M1, M2, (((1,), (1,)), ((), ())), precision="highest"
        )
        return wv + jnp.sum(S) * 1e-12

    scan_time(s_body, WVinv0, label="  S dot_general (120x15360)@(15360x120)")

    def s_body_default(wv):
        M1 = wv.reshape(P * 6, 3 * L)
        M2 = W0.reshape(P * 6, 3 * L)
        S = -jax.lax.dot_general(M1, M2, (((1,), (1,)), ((), ())))
        return wv + jnp.sum(S) * 1e-12

    scan_time(s_body_default, WVinv0, label="  S dot_general (default precision)")

    # full contributions for reference
    def contrib_body(p):
        c = landmark_contributions(p.T_cw, p.X, p.uv, p.mask, p.K, damping)
        return perturb(p, jnp.sum(c.rhs))

    scan_time(contrib_body, prob, label="landmark_contributions (all)")

    c0 = jax.block_until_ready(
        jax.jit(landmark_contributions)(prob.T_cw, prob.X, prob.uv, prob.mask, prob.K, damping)
    )

    def solve_body(S):
        d = reduced_solve(S, c0.rhs, damping, 2)
        return S + jnp.sum(d) * 1e-12

    scan_time(solve_body, c0.S, label="reduced_solve (120x120 LU)")


if __name__ == "__main__":
    main()
