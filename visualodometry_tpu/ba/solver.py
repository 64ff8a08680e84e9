"""Damped Gauss-Newton bundle adjustment with Schur elimination.

Problem layout (all fixed shapes, MXU/VPU friendly):
  poses     T_cw: (P, 4, 4) camera-from-world per keyframe
  landmarks X:    (L, 3) world points
  obs       uv:   (L, P, 2) pixel observations, mask: (L, P)

One GN iteration:
  residual r_lp = proj(K, T_p X_l) - uv_lp                      (L, P, 2)
  pose Jacobian    A_lp = Jproj · [I | -hat(p_cam)]             (L, P, 2, 6)
  landmark Jacobian B_lp = Jproj · R_p                          (L, P, 2, 3)
  U_p = Σ_l AᵀA + λ,  V_l = Σ_p BᵀB + λ,  W_lp = AᵀB
  Schur: S_pq = δ_pq U_p − Σ_l W_lp V_l⁻¹ W_lqᵀ   (dense 6P x 6P)
  rhs_p = g_p − Σ_l W_lp V_l⁻¹ h_l
  δpose = S⁻¹ rhs;  δX_l = V_l⁻¹ (h_l − Σ_p W_lpᵀ δpose_p)
  T_p ← exp(−δ_p) T_p;  X_l ← X_l − δX_l

Gauge: the first pose is held fixed (its 6x6 block is replaced by the
identity and its rhs zeroed); λ damping controls the residual scale gauge.
Landmark elimination is embarrassingly parallel over L — this is the axis
the distributed variant shards.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.geometry.camera import (
    project_points,
    projection_jacobian_point,
)
from visualodometry_tpu.geometry.se3 import se3_exp
from visualodometry_tpu.geometry.so3 import so3_hat


class BAProblem(NamedTuple):
    T_cw: jnp.ndarray  # (P, 4, 4)
    X: jnp.ndarray  # (L, 3)
    uv: jnp.ndarray  # (L, P, 2)
    mask: jnp.ndarray  # (L, P) bool
    K: jnp.ndarray  # (3, 3)


def _residuals_jacobians(prob: BAProblem):
    T, X, uv, mask, K = prob
    R = T[:, :3, :3]  # (P, 3, 3)
    t = T[:, :3, 3]  # (P, 3)
    # camera-frame points for every (landmark, pose) pair
    p_cam = (
        jnp.einsum("pij,lj->lpi", R, X, precision="highest") + t[None, :, :]
    )  # (L, P, 3)
    uv_hat, z = project_points(p_cam, K)  # (L, P, 2), (L, P)
    r = uv_hat - uv  # (L, P, 2)
    # invalidate behind-camera observations (they would poison the solve)
    m = mask & (z > 1e-3)
    Jp = projection_jacobian_point(p_cam, K)  # (L, P, 2, 3)
    # pose block: d p_cam / d xi, xi = [rho, phi], T <- exp(xi) T
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), p_cam.shape + (3,))
    Jx = jnp.concatenate([eye, -so3_hat(p_cam)], axis=-1)  # (L, P, 3, 6)
    A = jnp.einsum("lpij,lpjk->lpik", Jp, Jx, precision="highest")  # (L,P,2,6)
    # landmark block: d p_cam / d X = R_p
    B = jnp.einsum(
        "lpij,pjk->lpik", Jp, R, precision="highest"
    )  # (L, P, 2, 3)
    w = m.astype(X.dtype)[..., None, None]
    return r, A * w, B * w, m


def ba_iteration(
    prob: BAProblem, damping: jnp.ndarray, fixed_poses: int = 2
) -> BAProblem:
    T, X, uv, mask, K = prob
    P = T.shape[0]
    L = X.shape[0]
    r, A, B, m = _residuals_jacobians(prob)
    w = m.astype(X.dtype)

    # blocks (masked A, B already)
    U = jnp.einsum("lpik,lpim->pkm", A, A, precision="highest")  # (P, 6, 6)
    V = jnp.einsum("lpik,lpim->lkm", B, B, precision="highest")  # (L, 3, 3)
    W = jnp.einsum("lpik,lpim->lpkm", A, B, precision="highest")  # (L, P, 6, 3)
    g = jnp.einsum("lpik,lpi->pk", A, r * w[..., None], precision="highest")
    h = jnp.einsum("lpik,lpi->lk", B, r * w[..., None], precision="highest")

    # Levenberg damping
    U = U + damping * jnp.eye(6, dtype=X.dtype)
    V = V + damping * jnp.eye(3, dtype=X.dtype)
    # guard unobserved landmarks: keep V invertible, their delta comes out 0
    V = V + 1e-6 * jnp.eye(3, dtype=X.dtype)

    Vinv = jnp.linalg.inv(V)  # (L, 3, 3) batched

    WVinv = jnp.einsum("lpkj,lji->lpki", W, Vinv, precision="highest")  # (L,P,6,3)
    # S_pq = delta U_p - sum_l WVinv_lp W_lq^T
    S_red = jnp.einsum(
        "lpki,lqmi->pqkm", WVinv, W, precision="highest"
    )  # (P, P, 6, 6)
    S = -S_red
    S = S.at[jnp.arange(P), jnp.arange(P)].add(U)
    rhs = g - jnp.einsum("lpki,li->pk", WVinv, h, precision="highest")  # (P, 6)

    # gauge fix: freeze the first `fixed_poses` poses. One pose pins the
    # SE(3) gauge; a second pins the monocular scale gauge (reprojection
    # alone leaves a global scale free — without this, the window drifts in
    # scale even at zero residual).
    for f in range(fixed_poses):
        S = S.at[f, :].set(0.0).at[:, f].set(0.0)
        S = S.at[f, f].set(jnp.eye(6, dtype=X.dtype))
        rhs = rhs.at[f].set(0.0)

    S_dense = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    delta_pose = jnp.linalg.solve(S_dense, rhs.reshape(P * 6)).reshape(P, 6)

    # back-substitute landmarks
    Wt_dp = jnp.einsum("lpki,pk->li", W, delta_pose, precision="highest")  # (L, 3)
    delta_X = jnp.einsum(
        "lij,lj->li", Vinv, h - Wt_dp, precision="highest"
    )

    T_new = jnp.einsum(
        "pij,pjk->pik", se3_exp(-delta_pose), T, precision="highest"
    )
    # only move landmarks that have at least one live observation
    seen = jnp.any(m, axis=1)
    X_new = jnp.where(seen[:, None], X - delta_X, X)
    return BAProblem(T_cw=T_new, X=X_new, uv=uv, mask=mask, K=K)


def ba_cost(prob: BAProblem) -> jnp.ndarray:
    """Masked mean squared reprojection error (diagnostic)."""
    r, _, _, m = _residuals_jacobians(prob)
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
