"""Tests for the vectorized RANSAC estimators vs. ground truth and OpenCV.

Synthetic two-view geometry with controlled outlier rates, per SURVEY.md §4
(unit tests: "5-point on noiseless minimal sets, P3P, GN step" — here the
TPU-native design uses batched 8-point and 6-point DLT solvers; the tests
check the same contracts: pose recovery within tolerance at realistic
outlier rates, correct inlier classification, OpenCV-consistent (R, t)
conventions).
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.estimation import (
    estimate_essential_ransac,
    recover_pose,
    solve_pnp_ransac,
)
from visualodometry_tpu.estimation.pnp import refine_pose_gn
from visualodometry_tpu.geometry import make_T, so3_exp

K = np.array(
    [[7.18856e02, 0, 6.071928e02], [0, 7.18856e02, 1.852157e02], [0, 0, 1]],
    dtype=np.float32,
)


def _two_view_scene(rng, n=300, n_out=60, noise=0.3):
    """Points seen by cam0 at identity and cam1 at (R, t): x1 = R x0 + t."""
    pts = np.stack(
        [rng.uniform(-15, 15, n), rng.uniform(-4, 4, n), rng.uniform(8, 50, n)],
        axis=1,
    )
    w = np.array([0.01, 0.04, 0.005])
    R = cv2.Rodrigues(w)[0]
    t = np.array([-0.8, 0.05, 1.5])
    t /= np.linalg.norm(t)  # unit baseline, like recoverPose output

    uv0, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K.astype(np.float64), None)
    uv1, _ = cv2.projectPoints(pts, w, t, K.astype(np.float64), None)
    uv0 = uv0.reshape(-1, 2) + rng.normal(0, noise, (n, 2))
    uv1 = uv1.reshape(-1, 2) + rng.normal(0, noise, (n, 2))
    is_outlier = np.zeros(n, dtype=bool)
    out_idx = rng.choice(n, n_out, replace=False)
    is_outlier[out_idx] = True
    uv1[out_idx] += rng.uniform(15, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pts, R, t, uv0, uv1, is_outlier


class TestEssential:
    def test_recovers_pose_with_outliers(self, rng):
        pts, R_true, t_true, uv0, uv1, is_outlier = _two_view_scene(rng)
        n = len(uv0)
        cfg = VOConfig(init_ransac_thresh=1.0, essential_hypotheses=512)
        valid = jnp.ones(n, dtype=bool)
        res = estimate_essential_ransac(
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            valid,
            jnp.asarray(K),
            cfg,
            jax.random.key(0),
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        # nearly all outliers excluded (an outlier that lands near the
        # epipolar line is indistinguishable for E); most inliers retained
        assert inl[is_outlier].mean() < 0.05
        assert inl[~is_outlier].mean() > 0.8

        R, t = recover_pose(
            res.E,
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            res.inliers,
            jnp.asarray(K),
        )
        R, t = np.asarray(R), np.asarray(t)
        # rotation error
        ang = np.degrees(
            np.arccos(np.clip((np.trace(R_true.T @ R) - 1) / 2, -1, 1))
        )
        assert ang < 0.2, f"rotation error {ang} deg"
        # translation direction error (unit vectors, sign fixed by cheirality)
        cos_t = float(np.dot(t, t_true))
        assert cos_t > 0.999, f"translation direction cos {cos_t}"

    def test_matches_opencv_conventions(self, rng):
        pts, R_true, t_true, uv0, uv1, is_outlier = _two_view_scene(
            rng, n=200, n_out=20, noise=0.2
        )
        E_cv, mask_cv = cv2.findEssentialMat(
            uv0, uv1, K.astype(np.float64), method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv0, uv1, K.astype(np.float64))

        cfg = VOConfig()
        res = estimate_essential_ransac(
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            jnp.ones(len(uv0), dtype=bool),
            jnp.asarray(K),
            cfg,
            jax.random.key(1),
        )
        R, t = recover_pose(
            res.E,
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            res.inliers,
            jnp.asarray(K),
        )
        # both should agree with each other (same convention) within tolerance
        ang = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(R).T @ R_cv) - 1) / 2, -1, 1))
        )
        assert ang < 0.5
        assert float(np.dot(np.asarray(t), t_cv.ravel())) > 0.995

    def test_no_valid_matches_not_ok(self):
        cfg = VOConfig()
        n = 64
        res = estimate_essential_ransac(
            jnp.zeros((n, 2)),
            jnp.zeros((n, 2)),
            jnp.zeros(n, dtype=bool),
            jnp.asarray(K),
            cfg,
            jax.random.key(0),
        )
        assert not bool(res.ok)


class TestPnP:
    def _scene(self, rng, n=200, n_out=40, noise=0.3):
        pts = np.stack(
            [rng.uniform(-15, 15, n), rng.uniform(-4, 4, n), rng.uniform(8, 50, n)],
            axis=1,
        )
        w = np.array([0.03, -0.1, 0.02])
        R = cv2.Rodrigues(w)[0]
        t = np.array([1.2, -0.3, 2.0])
        uv, _ = cv2.projectPoints(pts, w, t, K.astype(np.float64), None)
        uv = uv.reshape(-1, 2) + rng.normal(0, noise, (n, 2))
        is_outlier = np.zeros(n, dtype=bool)
        out_idx = rng.choice(n, n_out, replace=False)
        is_outlier[out_idx] = True
        uv[out_idx] += rng.uniform(20, 100, (n_out, 2)) * rng.choice(
            [-1, 1], (n_out, 2)
        )
        T_cw = np.eye(4)
        T_cw[:3, :3] = R
        T_cw[:3, 3] = t
        return pts, uv, T_cw, is_outlier

    def test_recovers_pose_with_outliers(self, rng):
        pts, uv, T_true, is_outlier = self._scene(rng)
        cfg = VOConfig(pnp_reproj_err=2.0)
        res = solve_pnp_ransac(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.ones(len(uv), dtype=bool),
            jnp.asarray(K),
            cfg,
            jax.random.key(0),
        )
        assert bool(res.ok)
        T = np.asarray(res.T_cw)
        ang = np.degrees(
            np.arccos(
                np.clip((np.trace(T_true[:3, :3].T @ T[:3, :3]) - 1) / 2, -1, 1)
            )
        )
        assert ang < 0.1, f"rotation error {ang}"
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05
        inl = np.asarray(res.inliers)
        assert not inl[is_outlier].any()
        assert inl[~is_outlier].mean() > 0.9

    def test_masked_points_ignored(self, rng):
        pts, uv, T_true, is_outlier = self._scene(rng, n=150, n_out=0, noise=0.2)
        # poison the masked-out half with garbage; result must be unaffected
        valid = np.ones(150, dtype=bool)
        valid[100:] = False
        uv_poison = uv.copy()
        uv_poison[100:] = rng.uniform(0, 1000, (50, 2))
        cfg = VOConfig(pnp_reproj_err=2.0)
        res = solve_pnp_ransac(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(uv_poison, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(K),
            cfg,
            jax.random.key(2),
        )
        assert bool(res.ok)
        T = np.asarray(res.T_cw)
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05
        assert not np.asarray(res.inliers)[100:].any()

    def test_gn_refinement_converges(self, rng):
        pts, uv, T_true, _ = self._scene(rng, n=100, n_out=0, noise=0.0)
        # perturb the pose and let GN pull it back on noiseless data
        dw = np.array([0.01, -0.02, 0.015])
        dt = np.array([0.2, -0.1, 0.15])
        T0 = np.asarray(
            make_T(
                so3_exp(jnp.asarray(dw, jnp.float32)), jnp.asarray(dt, jnp.float32)
            )
        ) @ T_true
        T_ref = refine_pose_gn(
            jnp.asarray(T0.astype(np.float32)),
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.ones(100, dtype=jnp.float32),
            jnp.asarray(K),
            iters=15,
        )
        T_ref = np.asarray(T_ref)
        assert np.linalg.norm(T_ref[:3, 3] - T_true[:3, 3]) < 2e-2
        ang = np.degrees(
            np.arccos(
                np.clip(
                    (np.trace(T_true[:3, :3].T @ T_ref[:3, :3]) - 1) / 2, -1, 1
                )
            )
        )
        assert ang < 0.05


class TestP3P:
    """r4: Grunert minimal solver (cv2.solvePnPRansac's class)."""

    def _scene(self, rng, n=200, outlier_frac=0.25):
        from visualodometry_tpu.geometry.so3 import so3_exp

        w = 0.2 * rng.standard_normal(3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        t = np.asarray([0.3, -0.2, 0.5], np.float32)
        X = np.stack(
            [rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
             rng.uniform(6, 30, n)], 1,
        ).astype(np.float32)
        K = np.asarray(
            [[500.0, 0, 320], [0, 500.0, 180], [0, 0, 1]], np.float32
        )
        pc = X @ R.T + t
        uv = pc[:, :2] / pc[:, 2:] * 500.0 + [320, 180]
        uv += rng.normal(0, 0.3, uv.shape)
        n_out = int(outlier_frac * n)
        uv[:n_out] = rng.uniform([0, 0], [640, 360], (n_out, 2))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        return X, uv.astype(np.float32), K, T

    def test_p3p_ransac_recovers_pose_with_outliers(self, rng):
        from visualodometry_tpu.config import VOConfig
        from visualodometry_tpu.estimation.pnp import solve_pnp_ransac

        X, uv, K, T_true = self._scene(rng)
        cfg = VOConfig(
            pnp_solver="p3p", pnp_hypotheses=128, pnp_reproj_err=2.0
        )
        res = solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X), bool), jnp.asarray(K), cfg,
            jax.random.key(0),
        )
        assert bool(res.ok)
        T = np.asarray(res.T_cw)
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.02
        assert np.linalg.norm(T[:3, :3] - T_true[:3, :3]) < 0.01
        assert int(res.num_inliers) > 120

    def test_kabsch3_exact_on_elongated_triples(self, rng):
        """ADVICE r4 #1: the 3-point alignment must not square the
        condition number — triad composition is exact (f32 roundoff)
        even on 50x-elongated congruent triples where svd3-of-H^T H
        failed ~30% of the time."""
        from visualodometry_tpu.estimation.p3p import _kabsch3
        from visualodometry_tpu.geometry.so3 import so3_exp

        B = 256
        w = rng.normal(size=(B, 3)).astype(np.float32)
        R = np.asarray(jax.vmap(so3_exp)(jnp.asarray(w)))
        t = rng.normal(size=(B, 3)).astype(np.float32)
        X = rng.normal(size=(B, 3, 3)).astype(np.float32)
        X[..., 0] *= 50.0  # elongated geometry
        Pc = np.einsum("bij,bnj->bni", R, X) + t[:, None]
        Rh, th = _kabsch3(jnp.asarray(Pc), jnp.asarray(X))
        r_err = np.linalg.norm(np.asarray(Rh) - R, axis=(-2, -1))
        t_err = np.linalg.norm(np.asarray(th) - t, axis=-1)
        assert float((r_err + t_err).max()) < 0.02
