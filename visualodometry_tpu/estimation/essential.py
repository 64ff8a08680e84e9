"""Vectorized essential-matrix RANSAC and cheirality pose recovery.

Replaces `cv2.findEssentialMat(method=RANSAC)` + `cv2.recoverPose`
(reference: src/modules/vo.py:87-96) with a batched 8-point solver:

- H minimal samples are solved simultaneously (each an eigh of a 9x9
  normal matrix — MXU-friendly);
- every hypothesis is scored against every correspondence with the Sampson
  distance in one batched pass;
- the winning model is re-fit on its inlier set (mask-weighted normal
  equations), matching OpenCV's final refinement step;
- pose recovery tests all four (R, t) decompositions by triangulating all
  inliers for each candidate in a batch and counting positive depths.

Conventions match OpenCV: for correspondences (uv0 in frame0, uv1 in
frame1), E satisfies x1^T E x0 = 0 in normalized coordinates, and the
recovered (R, t) maps frame0 camera coordinates to frame1: x1 = R x0 + t.
The RANSAC threshold is in pixels and is rescaled by the mean focal length
to apply in normalized coordinates, like OpenCV does.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.estimation.ransac import sample_valid_indices
from visualodometry_tpu.geometry.camera import pixels_to_normalized
from visualodometry_tpu.geometry.linalg import smallest_eigvec, svd3


class EssentialResult(NamedTuple):
    E: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _eight_point_system(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Rows of the epipolar constraint x1^T E x0 = 0.

    x0, x1: (..., N, 2) normalized coords. Returns (..., N, 9) with E
    flattened row-major: [E00 E01 E02; E10 E11 E12; E20 E21 E22].
    """
    a, b = x0[..., 0], x0[..., 1]
    c, d = x1[..., 0], x1[..., 1]
    one = jnp.ones_like(a)
    # x1^T E x0 = sum_ij E_ij * (x1_i * x0_j) with homogeneous 3rd coord 1
    return jnp.stack(
        [c * a, c * b, c, d * a, d * b, d, a, b, one], axis=-1
    )


def _solve_e_from_rows(A: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Least-squares essential matrix from constraint rows.

    A: (..., N, 9); optional weights w: (..., N). Returns (..., 3, 3) with
    the rank-2 / equal-singular-value constraint enforced via svd3.
    """
    if w is not None:
        A = A * w[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A, precision="highest")
    e = smallest_eigvec(AtA)
    E = e.reshape(e.shape[:-1] + (3, 3))
    U, _, Vt = svd3(E)
    # project to the essential manifold: singular values (1, 1, 0)
    s_proj = jnp.array([1.0, 1.0, 0.0], dtype=E.dtype)
    return jnp.einsum(
        "...ij,j,...jk->...ik", U, s_proj, Vt, precision="highest"
    )


def _sampson_sq(E: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance (first-order geometric error).

    E: (..., 3, 3); x0, x1: (N, 2). Returns (..., N).
    """
    ones = jnp.ones_like(x0[..., :1])
    X0 = jnp.concatenate([x0, ones], axis=-1)  # (N, 3)
    X1 = jnp.concatenate([x1, ones], axis=-1)
    Ex0 = jnp.einsum("...ij,nj->...ni", E, X0, precision="highest")
    Etx1 = jnp.einsum("...ji,nj->...ni", E, X1, precision="highest")
    x1Ex0 = jnp.sum(X1 * Ex0, axis=-1)
    denom = (
        Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    )
    return (x1Ex0 * x1Ex0) / jnp.maximum(denom, 1e-12)


def _essential_from_rt(w: jnp.ndarray, R0: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x (exp(w) R0) with t the (unnormalized) translation."""
    from visualodometry_tpu.geometry.so3 import so3_exp

    R = jnp.matmul(so3_exp(w), R0, precision="highest")
    tx = jnp.array(
        [
            [0.0, -tvec[2], tvec[1]],
            [tvec[2], 0.0, -tvec[0]],
            [-tvec[1], tvec[0], 0.0],
        ],
        dtype=R.dtype,
    )
    return jnp.matmul(tx, R, precision="highest")


def refine_essential_manifold(
    E: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 5,
) -> jnp.ndarray:
    """GN refinement of E on the essential manifold (5 DOF).

    Minimizes the weighted signed Sampson residual over the inliers,
    parametrized as (so(3) perturbation of R, 2-dof tangent of the unit
    translation) — well-posed even on planar scenes, where a least-squares
    re-fit in the 9-dim linear space is degenerate (any member of the
    homography-compatible family fits a plane). This is the reason the
    five-point path must NOT be re-fit with the 8-point system.

    x0, x1: (N, 2) normalized coords; weights: (N,) float (0 = ignore).
    """
    from visualodometry_tpu.geometry.linalg import solve_psd_small

    # decompose E -> (R, t) once; cheirality does not matter for Sampson
    U, _, Vt = svd3(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R0 = jnp.matmul(jnp.matmul(U, W, precision="highest"), Vt, precision="highest")
    t0 = U[:, 2]

    ones = jnp.ones_like(x0[..., :1])
    X0 = jnp.concatenate([x0, ones], axis=-1)  # (N, 3)
    X1 = jnp.concatenate([x1, ones], axis=-1)

    def residuals(params, R0, t0):
        w_rot = params[:3]
        # tangent basis of the sphere at t0 (t0 stays unit under projection)
        b1 = _any_unit_orthogonal(t0)
        b2 = jnp.cross(t0, b1)
        t = t0 + params[3] * b1 + params[4] * b2
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        Em = _essential_from_rt(w_rot, R0, t)
        Ex0 = jnp.matmul(X0, Em.T, precision="highest")
        Etx1 = jnp.matmul(X1, Em, precision="highest")
        num = jnp.sum(X1 * Ex0, axis=-1)
        den = jnp.sqrt(
            jnp.maximum(
                Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2,
                1e-12,
            )
        )
        return (num / den) * weights

    def step(carry, _):
        R0, t0 = carry
        zero = jnp.zeros(5, dtype=E.dtype)
        r = residuals(zero, R0, t0)
        J = jax.jacfwd(residuals)(zero, R0, t0)  # (N, 5)
        JtJ = jnp.matmul(J.T, J, precision="highest")
        Jtr = jnp.matmul(J.T, r, precision="highest")
        lam = 1e-6 * jnp.trace(JtJ) / 5.0 + 1e-12
        delta = -solve_psd_small(JtJ + lam * jnp.eye(5, dtype=E.dtype), Jtr)
        # re-center the parametrization at the refined pose
        from visualodometry_tpu.geometry.so3 import so3_exp

        R_new = jnp.matmul(so3_exp(delta[:3]), R0, precision="highest")
        b1 = _any_unit_orthogonal(t0)
        b2 = jnp.cross(t0, b1)
        t_new = t0 + delta[3] * b1 + delta[4] * b2
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return (R_new, t_new), None

    (R_f, t_f), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    E_f = _essential_from_rt(jnp.zeros(3, E.dtype), R_f, t_f)
    norm = jnp.maximum(jnp.linalg.norm(E_f), 1e-12)
    return E_f / norm


def _any_unit_orthogonal(v: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit v (3,), branchless."""
    e = jnp.where(
        jnp.abs(v[0]) <= jnp.abs(v[2]),
        jnp.array([1.0, 0.0, 0.0], v.dtype),
        jnp.array([0.0, 0.0, 1.0], v.dtype),
    )
    u = jnp.cross(v, e)
    return u / jnp.maximum(jnp.linalg.norm(u), 1e-12)


def estimate_essential_ransac(
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: VOConfig,
    key: jax.Array,
) -> EssentialResult:
    """Batched essential-matrix RANSAC over padded correspondence arrays.

    uv0, uv1: (N, 2) pixel coords; valid: (N,) mask of live matches.
    `cfg.essential_solver` selects the hypothesis generator: "5point" is
    the Nistér minimal solver (the algorithm behind the reference's
    `cv2.findEssentialMat`, handles planar scenes); "8point" is the
    least-squares solver (one eigh per sample, cheaper per hypothesis but
    degenerate on planar scenes). Scoring and re-fit are shared.
    """
    x0 = pixels_to_normalized(uv0, K)
    x1 = pixels_to_normalized(uv1, K)

    H = cfg.essential_hypotheses
    rows_all = _eight_point_system(x0, x1)  # (N, 9)

    if cfg.essential_solver == "5point":
        from visualodometry_tpu.estimation.fivepoint import five_point_candidates

        idx = sample_valid_indices(key, valid, H, 5)  # (H, 5)
        E_c, cand_ok = five_point_candidates(x0[idx], x1[idx])  # (H, 10, 3, 3)
        E_h = E_c.reshape(-1, 3, 3)  # (H*10, 3, 3)
        hyp_ok = cand_ok.reshape(-1)
    else:
        idx = sample_valid_indices(key, valid, H, 8)  # (H, 8)
        E_h = _solve_e_from_rows(rows_all[idx])  # (H, 3, 3)
        hyp_ok = jnp.ones((H,), bool)

    # threshold in normalized coordinates (OpenCV divides by focal length)
    f_mean = 0.5 * (K[0, 0] + K[1, 1])
    thresh = cfg.init_ransac_thresh / f_mean
    thresh_sq = thresh * thresh

    d2 = _sampson_sq(E_h, x0, x1)  # (H', N)
    inlier_mat = (d2 < thresh_sq) & valid[None, :] & hyp_ok[:, None]
    counts = jnp.sum(inlier_mat, axis=1)
    best = jnp.argmax(counts)

    # final re-fit on the winning inlier set. The 5-point path refines on
    # the essential MANIFOLD (rotation + translation direction): a linear
    # 9-dim least-squares re-fit is degenerate on planar scenes (it gains
    # inliers while sliding along the homography-compatible family of E's),
    # which would throw away exactly the planar robustness the minimal
    # solver provides. Planar scenes also admit TWO full-support local
    # minima (the twisted pair of homography decompositions), so inlier
    # COUNT cannot pick the true motion: refine the top-k hypotheses and
    # select by continuous MSAC cost (truncated Sampson), whose global
    # minimum is the true solution. The 8-point path keeps the linear
    # re-fit (it is already planar-degenerate; re-fit matches its
    # semantics).
    best_inliers = inlier_mat[best]
    if cfg.essential_solver == "5point":
        # The initialization decides the first map's structure, and any
        # sampling-dependence here feeds the entire trajectory (engine
        # fixture ATE was bimodal 0.012/0.063 across seeds, with the
        # spread fully attributable to this estimate: pinning its RNG
        # key collapsed it). So: take a generous top-k by consensus,
        # polish EVERY candidate with an inlier refit plus two
        # robust-IRLS rounds (batched vmap, cheap), and only then select
        # by continuous truncated-MSAC cost. Polished candidates
        # collapse into a few basins and the cost picks the best —
        # the result is a property of the data whenever the true basin
        # is reachable from any of the top-k samples.
        #
        # IRLS weights are truncated Huber (delta/r inside 3x the gate,
        # zero beyond), matching the PnP solver's weighting — see pnp.py
        # for why neither pure Huber nor fully-redescending Tukey works.
        k_top = min(16, E_h.shape[0])
        _, top_idx = jax.lax.top_k(counts, k_top)
        E_ref = E_h[top_idx]  # (k, 3, 3)
        w_ref = inlier_mat[top_idx].astype(x0.dtype)  # (k, N)
        cut_sq = 9.0 * thresh_sq
        refit = jax.vmap(
            lambda Ei, wi: refine_essential_manifold(Ei, x0, x1, wi)
        )
        E_ref = refit(E_ref, w_ref)
        # 4 weight-rederivation rounds: with a short-baseline init the
        # optimum is shallow along the translation direction, and two
        # rounds leave a sampling-dependent +/-2 deg spread in t that
        # four rounds collapse 50x (measured on the bench fixture's
        # init frame; extra GN iterations per round change nothing)
        for _ in range(4):
            d2_ref = _sampson_sq(E_ref, x0, x1)  # (k, N)
            w_ref = (
                jnp.minimum(
                    1.0, jnp.sqrt(thresh_sq / jnp.maximum(d2_ref, 1e-18))
                )
                * (d2_ref < cut_sq)
                * valid[None, :]
            )
            E_ref = refit(E_ref, w_ref)
        # truncated-MSAC cost over valid correspondences
        d2_ref = _sampson_sq(E_ref, x0, x1)  # (k, N)
        cost = jnp.sum(
            jnp.minimum(d2_ref, thresh_sq) * valid[None, :], axis=1
        )
        E = E_ref[jnp.argmin(cost)]
    else:
        E = _solve_e_from_rows(rows_all, best_inliers.astype(rows_all.dtype))
    final_d2 = _sampson_sq(E, x0, x1)
    final_inliers = (final_d2 < thresh_sq) & valid
    num = jnp.sum(final_inliers).astype(jnp.int32)

    # Safety fallback to the raw winning hypothesis, judged by the SAME
    # truncated-MSAC cost the refinement optimizes. An inlier-count
    # criterion here silently discarded the polished estimate whenever
    # it traded one borderline inlier for geometric accuracy — which
    # re-injected the raw sample's noise exactly on the runs where the
    # polish mattered (measured: the init's t-direction spread stayed
    # at +/-2 deg across seeds because ~half the keys fell back).
    cost_ref = jnp.sum(jnp.minimum(final_d2, thresh_sq) * valid)
    d2_raw = _sampson_sq(E_h[best], x0, x1)
    cost_raw = jnp.sum(jnp.minimum(d2_raw, thresh_sq) * valid)
    use_refit = cost_ref <= cost_raw
    E = jnp.where(use_refit, E, E_h[best])
    final_inliers = jnp.where(use_refit, final_inliers, inlier_mat[best])
    num = jnp.where(use_refit, num, counts[best]).astype(jnp.int32)

    ok = num >= 8
    return EssentialResult(E=E, inliers=final_inliers, num_inliers=num, ok=ok)


def _triangulate_normalized(
    R: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DLT triangulation in normalized coords for P0=[I|0], P1=[R|t].

    R: (..., 3, 3), t: (..., 3); x0, x1: (N, 2).
    Returns (depth in cam0 (..., N), depth in cam1 (..., N)).
    """
    batch = R.shape[:-2]
    N = x0.shape[0]
    P0 = jnp.zeros(batch + (3, 4), dtype=R.dtype)
    P0 = P0.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    P1 = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)

    def rows(P, xy):
        # (..., N, 2, 4): u*P2 - P0 ; v*P2 - P1
        Pb = jnp.broadcast_to(P[..., None, :, :], batch + (N, 3, 4))
        r0 = xy[..., 0:1] * Pb[..., 2, :] - Pb[..., 0, :]
        r1 = xy[..., 1:2] * Pb[..., 2, :] - Pb[..., 1, :]
        return jnp.stack([r0, r1], axis=-2)

    A = jnp.concatenate([rows(P0, x0), rows(P1, x1)], axis=-2)  # (..., N, 4, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A, precision="highest")
    X = smallest_eigvec(AtA)  # (..., N, 4)
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    pts = X[..., :3] / w_safe[..., None]
    z0 = pts[..., 2]
    z1 = (
        jnp.einsum("...ij,...nj->...ni", R, pts, precision="highest")
        + t[..., None, :]
    )[..., 2]
    return z0, z1


def recover_pose(
    E: jnp.ndarray,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    inliers: jnp.ndarray,
    K: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Choose (R, t) from E by batched cheirality voting over the inliers.

    Equivalent to `cv2.recoverPose` (reference: src/modules/vo.py:96):
    decompose E into the four candidate poses, triangulate every inlier
    correspondence under each, and return the candidate with the most
    points in front of both cameras. t has unit norm.
    """
    x0 = pixels_to_normalized(uv0, K)
    x1 = pixels_to_normalized(uv1, K)

    U, _, Vt = svd3(E)
    # enforce proper rotations (det +1)
    detU = jnp.linalg.det(U)
    detVt = jnp.linalg.det(Vt)
    U = U * jnp.sign(detU)
    Vt = Vt * jnp.sign(detVt)

    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = jnp.einsum("ij,jk,kl->il", U, W, Vt, precision="highest")
    Rb = jnp.einsum("ij,jk,kl->il", U, W.T, Vt, precision="highest")
    t_unit = U[:, 2]

    R4 = jnp.stack([Ra, Ra, Rb, Rb])  # (4, 3, 3)
    t4 = jnp.stack([t_unit, -t_unit, t_unit, -t_unit])  # (4, 3)

    z0, z1 = _triangulate_normalized(R4, t4, x0, x1)  # (4, N) each
    front = (z0 > 0) & (z1 > 0) & inliers[None, :]
    votes = jnp.sum(front, axis=1)
    best = jnp.argmax(votes)
    return R4[best], t4[best]
