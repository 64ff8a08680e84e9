"""Vectorized PnP RANSAC with damped Gauss-Newton refinement.

Replaces `cv2.solvePnPRansac` (reference: src/modules/vo.py:135-141). The
minimal solver is a 6-point DLT for the 3x4 pose matrix in normalized image
coordinates (12x12 null space via eigh — batched over all hypotheses at
once), followed by an orthogonal-Procrustes projection onto SE(3) and a
cheirality-consistent sign choice. All hypotheses are scored against all
correspondences by pixel reprojection error in one pass; the winner's
inliers feed a fixed-iteration damped Gauss-Newton polish with analytic
Jacobians (the same Jacobian blocks the BA solver uses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.estimation.ransac import sample_valid_indices
from visualodometry_tpu.geometry.camera import (
    pixels_to_normalized,
    project_points,
    projection_jacobian_point,
)
from visualodometry_tpu.geometry.linalg import (
    smallest_eigvec,
    solve_psd_small,
    svd3,
)
from visualodometry_tpu.geometry.se3 import make_T, se3_exp
from visualodometry_tpu.geometry.so3 import so3_hat


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) camera-from-world
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _dlt_rows(X: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """DLT constraint rows for x ~ P [X; 1].

    X: (..., N, 3) world points, xy: (..., N, 2) normalized pixels.
    Returns (..., N, 2, 12) rows over vec(P) (row-major 3x4).
    """
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    u = xy[..., 0:1]
    v = xy[..., 1:2]
    row_u = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)
    row_v = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def _pose_from_P(P: jnp.ndarray, X_sample: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project a (..., 3, 4) DLT solution onto SE(3).

    Scale from the mean singular value of the rotation block, rotation from
    orthogonal Procrustes, global sign from cheirality of the sample points.
    Returns (R (..., 3, 3), t (..., 3)).
    """
    def decompose(Pm):
        M = Pm[..., :, :3]
        U, s, Vt = svd3(M)
        det_uv = jnp.linalg.det(
            jnp.einsum("...ij,...jk->...ik", U, Vt, precision="highest")
        )
        D = jnp.stack(
            [jnp.ones_like(det_uv), jnp.ones_like(det_uv), det_uv], axis=-1
        )
        R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt, precision="highest")
        lam = jnp.mean(s, axis=-1)
        t = Pm[..., :, 3] / jnp.maximum(lam[..., None], 1e-12)
        return R, t

    R_pos, t_pos = decompose(P)
    R_neg, t_neg = decompose(-P)

    def front_votes(R, t):
        z = (
            jnp.einsum("...ij,...nj->...ni", R, X_sample, precision="highest")
            + t[..., None, :]
        )[..., 2]
        return jnp.sum(z > 0, axis=-1)

    pick_pos = front_votes(R_pos, t_pos) >= front_votes(R_neg, t_neg)
    R = jnp.where(pick_pos[..., None, None], R_pos, R_neg)
    t = jnp.where(pick_pos[..., None], t_pos, t_neg)
    return R, t


def _reproj_err_sq(
    R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Squared pixel reprojection error. R: (..., 3, 3); X, uv: (N, ·)."""
    p_cam = (
        jnp.einsum("...ij,nj->...ni", R, X, precision="highest")
        + t[..., None, :]
    )
    uv_hat, z = project_points(p_cam, K)
    err = jnp.sum((uv_hat - uv) ** 2, axis=-1)
    return err, z


def refine_pose_gn(
    T_cw: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    weights: jnp.ndarray,
    K: jnp.ndarray,
    iters: int,
    damping: float = 1e-3,
) -> jnp.ndarray:
    """Damped Gauss-Newton pose polish on weighted correspondences.

    Minimizes sum_i w_i ||proj(K, T_cw X_i) - uv_i||^2 over a left-
    multiplied se(3) perturbation, for a fixed iteration count (static
    shape; weights of 0 drop points).
    """

    def body(_, T):
        R = T[:3, :3]
        t = T[:3, 3]
        p_cam = (
            jnp.einsum("ij,nj->ni", R, X, precision="highest") + t[None, :]
        )
        uv_hat, _ = project_points(p_cam, K)
        r = uv_hat - uv  # (N, 2)
        Jp = projection_jacobian_point(p_cam, K)  # (N, 2, 3)
        # d p_cam / d xi with T <- exp(xi) T, xi = [rho, phi]
        Jx = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (X.shape[0], 3, 3)),
                -so3_hat(p_cam),
            ],
            axis=-1,
        )  # (N, 3, 6)
        J = jnp.einsum("nij,njk->nik", Jp, Jx, precision="highest")  # (N, 2, 6)
        w = weights[:, None, None]
        H = jnp.einsum("nik,nil->nkl", J * w, J, precision="highest").sum(0)
        b = jnp.einsum("nik,ni->nk", J * w, r, precision="highest").sum(0)
        H = H + damping * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(6, dtype=T.dtype)
        delta = solve_psd_small(H, b)
        # bf16 default-precision pose composition costs ~1e-3
        # relative error on TPU (0.1 m at KITTI global scale) —
        # pin every small-matrix product in the pose chain
        return jnp.matmul(se3_exp(-delta), T, precision="highest")

    return jax.lax.fori_loop(0, iters, body, T_cw)


def solve_pnp_ransac(
    pts3d: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: VOConfig,
    key: jax.Array,
    T_init: jnp.ndarray | None = None,
) -> PnPResult:
    """Batched DLT-PnP RANSAC over padded 2D-3D correspondences.

    pts3d: (N, 3) world points; uv: (N, 2) pixels; valid: (N,) live mask.

    `T_init` (optional (4, 4) camera-from-world) joins the hypothesis
    pool alongside the sampled DLT solves. Motivation (r4, measured):
    on-chip numerics occasionally degrade EVERY minimal-sample DLT in a
    frame (12x12 eigenvector path), turning one bad frame into a full
    tracking reset (tests caught a frame with 235 healthy matches and 0
    PnP inliers). Seeding the pool with the previous frame's pose makes
    total failure impossible while motion is smooth, and changes
    nothing when the DLT hypotheses are healthy — the best hypothesis
    still wins by inlier count.
    """
    xy = pixels_to_normalized(uv, K)
    H = cfg.pnp_hypotheses

    if cfg.pnp_solver == "p3p":
        from visualodometry_tpu.estimation.p3p import p3p_grunert

        idx3 = sample_valid_indices(key, valid, H, 3)  # (H, 3)
        R4, t4, ok4 = p3p_grunert(pts3d[idx3], xy[idx3])
        R_h = R4.reshape(-1, 3, 3)  # (4H, 3, 3)
        t_h = t4.reshape(-1, 3)
        hyp_ok = ok4.reshape(-1)
        err_sq, z = _reproj_err_sq(R_h, t_h, pts3d, uv, K)
        thresh_sq = cfg.pnp_reproj_err * cfg.pnp_reproj_err
        inlier_mat = (
            (err_sq < thresh_sq)
            & (z > 0)
            & valid[None, :]
            & hyp_ok[:, None]
        )
        counts = jnp.sum(inlier_mat, axis=1)
        best = jnp.argmax(counts)
        return _finish_pnp(
            R_h, t_h, inlier_mat, counts, best, pts3d, uv, valid,
            K, cfg, T_init,
        )

    idx = sample_valid_indices(key, valid, H, 6)  # (H, 6)

    # Hartley-style conditioning of the 3D points (shared across hypotheses)
    w_sum = jnp.maximum(jnp.sum(valid), 1.0)
    centroid = jnp.sum(jnp.where(valid[:, None], pts3d, 0.0), axis=0) / w_sum
    spread = (
        jnp.sum(
            jnp.where(valid, jnp.linalg.norm(pts3d - centroid, axis=-1), 0.0)
        )
        / w_sum
    )
    scale = jnp.where(spread > 1e-6, 1.0 / spread, 1.0)
    Xn = (pts3d - centroid) * scale

    X_s = Xn[idx]  # (H, 6, 3)
    xy_s = xy[idx]  # (H, 6, 2)
    rows = _dlt_rows(X_s, xy_s).reshape(H, 12, 12)
    rows = rows / jnp.maximum(
        jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
    )
    AtA = jnp.einsum("hni,hnj->hij", rows, rows, precision="highest")
    p = smallest_eigvec(AtA)  # (H, 12)
    P = p.reshape(H, 3, 4)
    R_h, tn_h = _pose_from_P(P, X_s)  # pose wrt normalized points

    # un-normalize: x = R Xn + tn = R s (X - c) + tn -> R_w = R, t = tn/s...
    # P acts on Xn = s (X - c): p_cam/s' — scale sits in t and overall depth;
    # recover metric t: p_cam = R (s (X - c)) + tn  ==>  metric p_cam' =
    # p_cam / s = R X + (tn / s - R c)
    t_h = tn_h / scale - jnp.einsum(
        "hij,j->hi", R_h, centroid, precision="highest"
    )

    err_sq, z = _reproj_err_sq(R_h, t_h, pts3d, uv, K)  # (H, N)
    thresh_sq = cfg.pnp_reproj_err * cfg.pnp_reproj_err
    inlier_mat = (err_sq < thresh_sq) & (z > 0) & valid[None, :]
    counts = jnp.sum(inlier_mat, axis=1)
    best = jnp.argmax(counts)

    return _finish_pnp(
        R_h, t_h, inlier_mat, counts, best, pts3d, uv, valid, K, cfg,
        T_init,
    )


def _finish_pnp(
    R_h, t_h, inlier_mat, counts, best, pts3d, uv, valid, K, cfg, T_init
) -> PnPResult:
    """Shared RANSAC tail: T_init fallback + truncated-Huber IRLS local
    optimization + robust-cost safety fallback (see inline comments)."""
    thresh_sq = cfg.pnp_reproj_err * cfg.pnp_reproj_err
    if T_init is not None:
        # FALLBACK only, never a competitor: a drifting map makes the
        # previous pose out-score fresh DLT hypotheses frame after
        # frame (self-reinforcing drift momentum — letting it compete
        # outright regressed 256-frame drift 5.1 -> 8.9 m on one seed,
        # r4). It steps in only when the sampled hypotheses are
        # degenerate (under half its inlier support) — the numerical-
        # failure rescue it exists for.
        err_i, z_i = _reproj_err_sq(
            T_init[:3, :3], T_init[:3, 3], pts3d, uv, K
        )
        inl_i = (err_i < thresh_sq) & (z_i > 0) & valid
        count_i = jnp.sum(inl_i)
        use_init = counts[best] < jnp.maximum(6, count_i // 2)
        R_h = jnp.concatenate([R_h, T_init[None, :3, :3]], axis=0)
        t_h = jnp.concatenate([t_h, T_init[None, :3, 3]], axis=0)
        inlier_mat = jnp.concatenate([inlier_mat, inl_i[None]], axis=0)
        counts = jnp.concatenate([counts, count_i[None]], axis=0)
        best = jnp.where(use_init, counts.shape[0] - 1, best)

    # Robust local optimization: Huber-IRLS over ALL valid
    # correspondences, initialized from the best hypothesis. A
    # hard-inlier LO loop (refine on the consensus set, re-threshold,
    # repeat) has many near-tied fixpoints when a sizable fraction of
    # points sits near the threshold — which seed reaches which is
    # decided by RANSAC sampling, measured as a 40-57 mm translation
    # scatter across seeds on a 250-point problem where
    # cv2.solvePnPRansac is deterministic. The Huber objective is
    # continuous in the residuals, so its optimum is a property of the
    # DATA; IRLS rounds re-derive weights at the refined pose and
    # converge to it from any decent hypothesis.
    T_out = make_T(R_h[best], t_h[best])
    # Truncated-Huber weights: w = min(1, delta/r) inside 3*delta, zero
    # beyond. Pure Huber's heavy tail drags the pose toward
    # stale/drifted map landmarks on long sequences (segment ATE 2.9 ->
    # 11 on the 256-frame fixture); a fully redescending Tukey weight
    # reintroduces basin sensitivity to the RANSAC seed (measured 0.127
    # on a seed that Huber tracked at 0.013). Truncation keeps the
    # smooth near-threshold behavior that makes the optimum
    # data-determined while bounding far-outlier influence at zero.
    delta = jnp.asarray(
        cfg.pnp_irls_delta * cfg.pnp_reproj_err, pts3d.dtype
    )
    cut_sq = (cfg.pnp_irls_cut * cfg.pnp_reproj_err) ** 2
    for rnd in range(max(1, cfg.pnp_refine_rounds)):
        err_sq_r, z_r = _reproj_err_sq(
            T_out[:3, :3], T_out[:3, 3], pts3d, uv, K
        )
        r = jnp.sqrt(jnp.maximum(err_sq_r, 1e-12))
        w = (
            jnp.minimum(1.0, delta / r)
            * (err_sq_r < cut_sq)
            * valid
            * (z_r > 0)
        )
        # full iteration budget only for the cold start from the raw
        # DLT hypothesis; later rounds only re-weight an already
        # converged pose (GN re-converges in a few steps), and the GN
        # chain is serial latency on TPU — iterations are wall time
        iters = cfg.pnp_refine_iters if rnd == 0 else max(
            3, cfg.pnp_refine_iters // 3
        )
        T_out = refine_pose_gn(T_out, pts3d, uv, w, K, iters)

    err_sq_f, z_f = _reproj_err_sq(T_out[:3, :3], T_out[:3, 3], pts3d, uv, K)
    inliers_f = (err_sq_f < thresh_sq) & (z_f > 0) & valid
    num_f = jnp.sum(inliers_f).astype(jnp.int32)
    # Safety fallback judged by truncated-MSAC cost (the objective the
    # IRLS optimizes), NOT inlier count: a count criterion discards the
    # refined pose whenever it trades a borderline inlier for geometric
    # accuracy, re-injecting hypothesis noise (see essential.py).
    cost_ref = jnp.sum(jnp.minimum(err_sq_f, thresh_sq) * valid)
    err_sq_0, _ = _reproj_err_sq(R_h[best], t_h[best], pts3d, uv, K)
    cost_raw = jnp.sum(jnp.minimum(err_sq_0, thresh_sq) * valid)
    keep_refined = cost_ref <= cost_raw
    T_out = jnp.where(keep_refined, T_out, make_T(R_h[best], t_h[best]))
    inliers_out = jnp.where(keep_refined, inliers_f, inlier_mat[best])
    num_out = jnp.where(keep_refined, num_f, counts[best]).astype(jnp.int32)

    ok = num_out >= 6
    return PnPResult(T_cw=T_out, inliers=inliers_out, num_inliers=num_out, ok=ok)
