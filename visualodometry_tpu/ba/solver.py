"""Damped Gauss-Newton bundle adjustment with Schur elimination.

Problem layout (all fixed shapes, MXU/VPU friendly):
  poses     T_cw: (P, 4, 4) camera-from-world per keyframe
  landmarks X:    (L, 3) world points
  obs       uv:   (L, P, 2) pixel observations, mask: (L, P)

One GN iteration:
  residual r_lp = proj(K, T_p X_l) - uv_lp                      (L, P, 2)
  pose Jacobian    A_lp = Jproj · [I | -hat(p_cam)]             (L, P, 2, 6)
  landmark Jacobian B_lp = Jproj · R_p                          (L, P, 2, 3)
  U_p = Σ_l AᵀA,  V_l = Σ_p BᵀB + λ,  W_lp = AᵀB
  Schur: S_pq = δ_pq U_p − Σ_l W_lp V_l⁻¹ W_lqᵀ   (dense 6P x 6P)
  rhs_p = g_p − Σ_l W_lp V_l⁻¹ h_l
  δpose = S⁻¹ rhs;  δX_l = V_l⁻¹ (h_l − Σ_p W_lpᵀ δpose_p)
  T_p ← exp(−δ_p) T_p;  X_l ← X_l − δX_l

Gauge: the first two poses are held fixed — one pins the SE(3) gauge, the
second pins the monocular scale gauge (reprojection alone leaves a global
scale free).

The split into `landmark_contributions` (a pure sum over landmarks) and
`reduced_solve` is deliberate: every term of the reduced pose system is a
Σ_l, so the distributed variant shards L across the device mesh, computes
shard-local contributions, and reduces them with a single psum before the
(replicated) tiny dense solve — see parallel/distributed_ba.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.geometry.camera import (
    project_points,
    projection_jacobian_point,
)
from visualodometry_tpu.geometry.linalg import inv3_sym, solve_psd
from visualodometry_tpu.geometry.se3 import se3_exp
from visualodometry_tpu.geometry.so3 import so3_hat


class BAProblem(NamedTuple):
    T_cw: jnp.ndarray  # (P, 4, 4)
    X: jnp.ndarray  # (L, 3)
    uv: jnp.ndarray  # (L, P, 2)
    mask: jnp.ndarray  # (L, P) bool
    K: jnp.ndarray  # (3, 3)


class LandmarkContrib(NamedTuple):
    """Shard-local Σ_l terms of the reduced pose system + back-sub data."""

    S: jnp.ndarray  # (P, P, 6, 6) — δ_pq U_p − Σ_l W V⁻¹ Wᵀ (local sum)
    rhs: jnp.ndarray  # (P, 6) — g − Σ_l W V⁻¹ h (local sum)
    Vinv: jnp.ndarray  # (L_local, 3, 3)
    W: jnp.ndarray  # (L_local, P, 6, 3)
    h: jnp.ndarray  # (L_local, 3)
    seen: jnp.ndarray  # (L_local,)


def _residuals_jacobians(T, X, uv, mask, K):
    R = T[:, :3, :3]  # (P, 3, 3)
    t = T[:, :3, 3]  # (P, 3)
    p_cam = (
        jnp.einsum("pij,lj->lpi", R, X, precision="highest") + t[None, :, :]
    )  # (L, P, 3)
    uv_hat, z = project_points(p_cam, K)
    r = uv_hat - uv  # (L, P, 2)
    m = mask & (z > 1e-3)  # behind-camera obs would poison the solve
    Jp = projection_jacobian_point(p_cam, K)  # (L, P, 2, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), p_cam.shape + (3,))
    Jx = jnp.concatenate([eye, -so3_hat(p_cam)], axis=-1)  # (L, P, 3, 6)
    A = jnp.einsum("lpij,lpjk->lpik", Jp, Jx, precision="highest")
    B = jnp.einsum("lpij,pjk->lpik", Jp, R, precision="highest")
    w = m.astype(X.dtype)[..., None, None]
    return r, A * w, B * w, m


def landmark_contributions(
    T: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    damping: jnp.ndarray,
) -> LandmarkContrib:
    """Per-landmark-block GN terms, summed over the local landmark set."""
    P = T.shape[0]
    r, A, B, m = _residuals_jacobians(T, X, uv, mask, K)
    w = m.astype(X.dtype)

    U = jnp.einsum("lpik,lpim->pkm", A, A, precision="highest")
    V = jnp.einsum("lpik,lpim->lkm", B, B, precision="highest")
    W = jnp.einsum("lpik,lpim->lpkm", A, B, precision="highest")
    g = jnp.einsum("lpik,lpi->pk", A, r * w[..., None], precision="highest")
    h = jnp.einsum("lpik,lpi->lk", B, r * w[..., None], precision="highest")

    V = V + (damping + 1e-6) * jnp.eye(3, dtype=X.dtype)
    # closed-form symmetric 3x3 inverse: jnp.linalg.inv is a serialized
    # batched LU on TPU (~7 ms at L=5120 vs ~0 for the adjugate)
    Vinv = inv3_sym(V)

    WVinv = jnp.einsum("lpkj,lji->lpki", W, Vinv, precision="highest")
    # S_pq[k,m] = -sum_{l,i} WVinv[l,p,k,i] W[l,q,m,i]: reshaped into ONE
    # (6P, 3L) @ (3L, 6P) MXU matmul — the 4-index einsum lowers to a
    # loop of small contractions (~2.6 ms at P=20, L=5120; ~0.3 ms as a
    # single matmul)
    L_loc = W.shape[0]
    M1 = WVinv.transpose(1, 2, 0, 3).reshape(P * 6, L_loc * 3)
    M2 = W.transpose(0, 3, 1, 2).reshape(L_loc * 3, P * 6)
    S = -jnp.matmul(M1, M2, precision="highest").reshape(P, 6, P, 6)
    S = S.transpose(0, 2, 1, 3)
    S = S.at[jnp.arange(P), jnp.arange(P)].add(U)
    rhs = g - jnp.einsum("lpki,li->pk", WVinv, h, precision="highest")

    return LandmarkContrib(
        S=S, rhs=rhs, Vinv=Vinv, W=W, h=h, seen=jnp.any(m, axis=1)
    )


def reduced_solve(
    S: jnp.ndarray,
    rhs: jnp.ndarray,
    damping: jnp.ndarray,
    fixed_poses: int,
) -> jnp.ndarray:
    """Solve the (gauge-fixed, damped) dense reduced pose system."""
    P = rhs.shape[0]
    dtype = rhs.dtype
    S = S.at[jnp.arange(P), jnp.arange(P)].add(damping * jnp.eye(6, dtype=dtype))
    # gauge fix: freeze the first `fixed_poses` poses
    for f in range(fixed_poses):
        S = S.at[f, :].set(0.0).at[:, f].set(0.0)
        S = S.at[f, f].set(jnp.eye(6, dtype=dtype))
        rhs = rhs.at[f].set(0.0)
    S_dense = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    # solve_psd: unrolled Cholesky for small windows (P <= 2), library
    # solve above that (see its docstring for the evaluated alternatives)
    return solve_psd(S_dense, rhs.reshape(P * 6)).reshape(P, 6)


def apply_updates(
    T: jnp.ndarray,
    X: jnp.ndarray,
    delta_pose: jnp.ndarray,
    contrib: LandmarkContrib,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose retraction + landmark back-substitution (shard-local)."""
    T_new = jnp.einsum(
        "pij,pjk->pik", se3_exp(-delta_pose), T, precision="highest"
    )
    Wt_dp = jnp.einsum(
        "lpki,pk->li", contrib.W, delta_pose, precision="highest"
    )
    delta_X = jnp.einsum(
        "lij,lj->li", contrib.Vinv, contrib.h - Wt_dp, precision="highest"
    )
    X_new = jnp.where(contrib.seen[:, None], X - delta_X, X)
    return T_new, X_new


def ba_iteration(
    prob: BAProblem, damping: jnp.ndarray, fixed_poses: int = 2
) -> BAProblem:
    T, X, uv, mask, K = prob
    contrib = landmark_contributions(T, X, uv, mask, K, damping)
    delta_pose = reduced_solve(contrib.S, contrib.rhs, damping, fixed_poses)
    T_new, X_new = apply_updates(T, X, delta_pose, contrib)
    return BAProblem(T_cw=T_new, X=X_new, uv=uv, mask=mask, K=K)


def ba_cost(prob: BAProblem) -> jnp.ndarray:
    """Masked mean squared reprojection error (diagnostic)."""
    r, _, _, m = _residuals_jacobians(*prob)
    err = jnp.sum(r * r, axis=-1) * m.astype(r.dtype)
    return jnp.sum(err) / jnp.maximum(jnp.sum(m), 1.0)


def ba_solve(
    prob: BAProblem,
    iters: int = 8,
    damping: float = 1e-3,
    fixed_poses: int = 2,
) -> BAProblem:
    """Run a fixed number of damped GN iterations (static shape)."""
    damping = jnp.asarray(damping, prob.X.dtype)

    def body(_, p):
        return ba_iteration(p, damping, fixed_poses=fixed_poses)

    return jax.lax.fori_loop(0, iters, body, prob)
