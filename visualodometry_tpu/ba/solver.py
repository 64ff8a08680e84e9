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

from visualodometry_tpu.geometry.linalg import solve_psd
from visualodometry_tpu.geometry.se3 import se3_exp


class BAProblem(NamedTuple):
    T_cw: jnp.ndarray  # (P, 4, 4)
    X: jnp.ndarray  # (L, 3)
    uv: jnp.ndarray  # (L, P, 2)
    mask: jnp.ndarray  # (L, P) bool
    K: jnp.ndarray  # (3, 3)


class LandmarkContrib(NamedTuple):
    """Shard-local Σ_l terms of the reduced pose system + back-sub data.

    Back-substitution fields are LANDMARK-LAST: the landmark axis is the
    only large one, so it must ride the 128-lane dimension — trailing
    (6, 3)-shaped block axes would be padded onto (8, 128) tiles, a ~16x
    memory-traffic blowup that made the whole solve bandwidth-bound at
    9% of speed-of-light (measured round 2: 62.7 -> see RESULTS.md).
    """

    S: jnp.ndarray  # (P, P, 6, 6) — δ_pq U_p − Σ_l W V⁻¹ Wᵀ (local sum)
    rhs: jnp.ndarray  # (P, 6) — g − Σ_l W V⁻¹ h (local sum)
    Vinv: jnp.ndarray  # (3, 3, L_local)
    W: jnp.ndarray  # (P, 6, 3, L_local)
    h: jnp.ndarray  # (3, L_local)
    seen: jnp.ndarray  # (L_local,)


def _residuals_jacobians_lanes(T, X, uv, mask, K):
    """Residuals + Jacobians in landmark-last layout.

    Returns (r (P, 2, L), A (P, 2, 6, L), B (P, 2, 3, L), m (P, L)):
    every array keeps the large L axis on the lanes; the pose/block axes
    are small and land on (well-filled) sublanes. The camera transform
    itself is one (3, 3) @ (3, L) matmul per pose; the Jacobian entries
    are closed-form elementwise expressions over (P, L).
    """
    dtype = X.dtype
    R = T[:, :3, :3]  # (P, 3, 3)
    t = T[:, :3, 3]  # (P, 3)
    p = (
        jnp.einsum("pij,jl->pil", R, X.T, precision="highest")
        + t[:, :, None]
    )  # (P, 3, L)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]  # (P, L)
    eps = jnp.asarray(1e-8, dtype)
    zs = jnp.where(jnp.abs(z) < eps, eps, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = jnp.stack([u, v], axis=1) - uv.transpose(1, 2, 0)  # (P, 2, L)
    m = mask.T & (z > 1e-3)  # behind-camera obs would poison the solve
    w = m.astype(dtype)

    zero = jnp.zeros_like(x)
    # Jp rows (d uv / d p_cam) and their products with [I | -hat(p)]:
    # standard SE(3) reprojection Jacobian, written out so each of the
    # 6 (u) + 6 (v) entries is one fused elementwise expression on lanes
    ju = (fx * iz, zero, -fx * x * iz2)
    jv = (zero, fy * iz, -fy * y * iz2)
    Au = jnp.stack(
        [
            ju[0], ju[1], ju[2],
            -fx * x * y * iz2,
            fx * (1.0 + x * x * iz2),
            -fx * y * iz,
        ],
        axis=1,
    )  # (P, 6, L)
    Av = jnp.stack(
        [
            jv[0], jv[1], jv[2],
            -fy * (1.0 + y * y * iz2),
            fy * x * y * iz2,
            fy * x * iz,
        ],
        axis=1,
    )
    A = jnp.stack([Au, Av], axis=1) * w[:, None, None, :]  # (P, 2, 6, L)
    # B rows = Jp_row @ R_p (3-term contractions, lanes untouched)
    Bu = jnp.einsum("pl,pk->pkl", ju[0], R[:, 0]) + jnp.einsum(
        "pl,pk->pkl", ju[2], R[:, 2]
    )
    Bv = jnp.einsum("pl,pk->pkl", jv[1], R[:, 1]) + jnp.einsum(
        "pl,pk->pkl", jv[2], R[:, 2]
    )
    B = jnp.stack([Bu, Bv], axis=1) * w[:, None, None, :]  # (P, 2, 3, L)
    return r, A, B, m


def _inv3_sym_lanes(V: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of symmetric (3, 3, L) matrices.

    Same math as geometry.linalg.inv3_sym but for the matrix-first,
    lanes-last layout (each component is an (L,) vector — pure VPU)."""
    a, b, c = V[0, 0], V[0, 1], V[0, 2]
    d, e, f = V[1, 1], V[1, 2], V[2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    det = a * A + b * B + c * C
    tiny = jnp.asarray(1e-30, V.dtype)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > tiny, det, tiny)
    row0 = jnp.stack([A, B, C])
    row1 = jnp.stack([B, D, E])
    row2 = jnp.stack([C, E, F])
    return jnp.stack([row0, row1, row2]) * inv_det


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
    r, A, B, m = _residuals_jacobians_lanes(T, X, uv, mask, K)
    w = m.astype(X.dtype)
    rw = r * w[:, None, :]  # (P, 2, L)

    # U/g contract over lanes (l) — einsum → MXU is already optimal.
    U = jnp.einsum("pial,pibl->pab", A, A, precision="highest")  # (P,6,6)
    g = jnp.einsum("pial,pil->pa", A, rw, precision="highest")  # (P, 6)
    # V/W/h contract over the TINY (p, i) axes with L in the output —
    # einsum lowers those to dot_generals with relayouts (2.9 ms/iter
    # measured at P=20, L=5120); broadcast-multiply-reduce fuses to
    # single-pass VPU loops with L on lanes (scripts/profile_ba_alt.py)
    V = jnp.sum(B[:, :, :, None, :] * B[:, :, None, :, :], axis=(0, 1))
    W = jnp.sum(A[:, :, :, None, :] * B[:, :, None, :, :], axis=1)
    h = jnp.sum(B * rw[:, :, None, :], axis=(0, 1))

    lam = damping + 1e-6
    V = V.at[0, 0].add(lam).at[1, 1].add(lam).at[2, 2].add(lam)
    # closed-form symmetric 3x3 inverse: jnp.linalg.inv is a serialized
    # batched LU on TPU (~7 ms at L=5120 vs ~0 for the adjugate)
    Vinv = _inv3_sym_lanes(V)

    # W V⁻¹ contracts the tiny b axis with L in the OUTPUT: as an einsum
    # XLA lowers it to a dot_general plus relayouts (1.5 ms measured);
    # broadcast-multiply-reduce keeps L on lanes and fuses into one VPU
    # pass (scripts/profile_ba_alt.py)
    WVinv = jnp.sum(
        W[:, :, :, None, :] * Vinv[None, None, :, :, :], axis=2
    )  # (P, 6, 3, L)
    # S_pq[a,b] = -Σ_{c,l} WVinv[p,a,c,l] W[q,b,c,l]: 3 clean (6P, L) x
    # (L, 6P) MXU matmuls (lanes contraction). The single fused-(c, l)
    # reshape variant forces a tiled-layout relayout of both operands
    # and measured 1.2 ms vs ~0.1 for the c-sliced form.
    L_loc = W.shape[-1]
    S = jnp.zeros((P * 6, P * 6), X.dtype)
    for c in range(3):
        M1 = WVinv[:, :, c, :].reshape(P * 6, L_loc)
        M2 = W[:, :, c, :].reshape(P * 6, L_loc)
        S = S - jax.lax.dot_general(
            M1, M2, (((1,), (1,)), ((), ())), precision="highest"
        )
    S = S.reshape(P, 6, P, 6).transpose(0, 2, 1, 3)
    S = S.at[jnp.arange(P), jnp.arange(P)].add(U)
    rhs = g - jnp.sum(WVinv * h[None, None, :, :], axis=(2, 3))

    return LandmarkContrib(
        S=S, rhs=rhs, Vinv=Vinv, W=W, h=h, seen=jnp.any(m, axis=0)
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
    # same tiny-contraction-with-L-in-output pattern as V/W/h: fused
    # multiply-reduce instead of einsum→dot_general (see
    # landmark_contributions)
    Wt_dp = jnp.sum(
        contrib.W * delta_pose[:, :, None, None], axis=(0, 1)
    )  # (3, L)
    delta_X = jnp.sum(
        contrib.Vinv * (contrib.h - Wt_dp)[None, :, :], axis=1
    )  # (3, L)
    X_new = jnp.where(contrib.seen[:, None], X - delta_X.T, X)
    return T_new, X_new


class ScalePrior(NamedTuple):
    """Radial scale-gauge prior for windowed monocular BA.

    Reprojection cost is nearly flat along the monocular scale
    direction once the window's structure is deep relative to its
    baselines; with only the two oldest poses frozen, the solve can
    slide the NEWEST pose ~1 m radially while reducing reprojection
    cost by fractions of a px^2 (measured round 2 — the reason
    ba_pose_correction defaulted off). This prior pins each free pose's
    DISTANCE from the gauge pose to its pre-solve value with relative
    sigma `rel`: a residual (||c_p - c_0|| - d0_p) / (rel * d0_p) per
    pose, purely radial, so genuine lateral/rotational corrections are
    untouched.
    """

    d0: jnp.ndarray  # (P,) pre-solve distances ||c_p - c_0||
    inv_sigma: jnp.ndarray  # (P,) 1/(rel*d0), 0 for fixed/degenerate


def make_scale_prior(
    T: jnp.ndarray, rel: float, fixed_poses: int = 2
) -> ScalePrior:
    """Build the prior anchored at the pre-solve pose configuration."""
    c = -jnp.einsum(
        "pji,pj->pi", T[:, :3, :3], T[:, :3, 3], precision="highest"
    )  # (P, 3) camera centers
    d0 = jnp.linalg.norm(c - c[0], axis=-1)
    p_idx = jnp.arange(T.shape[0])
    ok = (p_idx >= fixed_poses) & (d0 > 1e-6)
    inv_sigma = jnp.where(ok, 1.0 / (rel * jnp.maximum(d0, 1e-6)), 0.0)
    return ScalePrior(d0=d0, inv_sigma=inv_sigma)


def scale_prior_terms(
    T: jnp.ndarray, prior: ScalePrior
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dU (P, 3, 3), dg (P, 3)) Gauss-Newton terms of the prior.

    With the solver's update T <- exp(-delta) T, a pose center moves
    c_new ~ c + R^T rho (rotation drops to first order), so the
    residual s = (||c_p - c_0|| - d0) * inv_sigma linearizes as
    s - A_s delta with A_s = -[(R u)^T, 0] * inv_sigma. Contributions
    follow the same normal-equation convention as the reprojection
    terms: U += A_s^T A_s, g += A_s^T s.
    """
    R = T[:, :3, :3]
    c = -jnp.einsum("pji,pj->pi", R, T[:, :3, 3], precision="highest")
    dvec = c - c[0]
    d = jnp.linalg.norm(dvec, axis=-1)
    u = dvec / jnp.maximum(d, 1e-9)[:, None]
    Ru = jnp.einsum("pij,pj->pi", R, u, precision="highest")  # (P, 3)
    s = (d - prior.d0) * prior.inv_sigma
    J = Ru * prior.inv_sigma[:, None]  # = -A_s[:, :3]
    dU = jnp.einsum("pa,pb->pab", J, J)
    dg = -J * s[:, None]
    return dU, dg


def ba_iteration(
    prob: BAProblem,
    damping: jnp.ndarray,
    fixed_poses: int = 2,
    scale_prior: ScalePrior | None = None,
) -> BAProblem:
    T, X, uv, mask, K = prob
    contrib = landmark_contributions(T, X, uv, mask, K, damping)
    S, rhs = contrib.S, contrib.rhs
    if scale_prior is not None:
        dU, dg = scale_prior_terms(T, scale_prior)
        P = T.shape[0]
        S = S.at[jnp.arange(P), jnp.arange(P), :3, :3].add(dU)
        rhs = rhs.at[:, :3].add(dg)
    delta_pose = reduced_solve(S, rhs, damping, fixed_poses)
    T_new, X_new = apply_updates(T, X, delta_pose, contrib)
    return BAProblem(T_cw=T_new, X=X_new, uv=uv, mask=mask, K=K)


def ba_cost(prob: BAProblem) -> jnp.ndarray:
    """Masked mean squared reprojection error (diagnostic)."""
    r, _, _, m = _residuals_jacobians_lanes(*prob)
    err = jnp.sum(r * r, axis=1) * m.astype(r.dtype)
    return jnp.sum(err) / jnp.maximum(jnp.sum(m), 1.0)


def ba_solve(
    prob: BAProblem,
    iters: int = 8,
    damping: float = 1e-3,
    fixed_poses: int = 2,
    scale_prior_rel: float = 0.0,
) -> BAProblem:
    """Run a fixed number of damped GN iterations (static shape).

    scale_prior_rel > 0 adds the radial ScalePrior (see its docstring)
    anchored at the entry pose configuration — required for
    pose-correcting windowed monocular BA, where the scale direction is
    weakly observable.
    """
    damping = jnp.asarray(damping, prob.X.dtype)
    prior = (
        make_scale_prior(prob.T_cw, scale_prior_rel, fixed_poses)
        if scale_prior_rel > 0.0
        else None
    )

    def body(_, p):
        return ba_iteration(
            p, damping, fixed_poses=fixed_poses, scale_prior=prior
        )

    return jax.lax.fori_loop(0, iters, body, prob)
