"""Tests for the batched Nistér five-point essential solver.

Per SURVEY.md §4 ("5-point on noiseless minimal sets") and §2.3 N5: the
minimal solver must reproduce `cv2.findEssentialMat`'s capabilities,
including the planar-scene case where the 8-point least-squares solver is
degenerate (the E that fits a plane is not unique for 8-point).
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.estimation import estimate_essential_ransac, recover_pose
from visualodometry_tpu.estimation.fivepoint import five_point_candidates, null_basis

K = np.array(
    [[7.18856e02, 0, 6.071928e02], [0, 7.18856e02, 1.852157e02], [0, 0, 1]],
    dtype=np.float32,
)


def _normalized(uv):
    x = (uv[:, 0] - K[0, 2]) / K[0, 0]
    y = (uv[:, 1] - K[1, 2]) / K[1, 1]
    return np.stack([x, y], axis=1).astype(np.float32)


def _project(pts, w, t):
    uv, _ = cv2.projectPoints(pts, w, t, K.astype(np.float64), None)
    return uv.reshape(-1, 2)


def _scene(rng, n, planar=False):
    if planar:
        # all points on a tilted plane — the 8-point degenerate case
        u = rng.uniform(-12, 12, n)
        v = rng.uniform(-5, 5, n)
        origin = np.array([0.0, 0.5, 20.0])
        eu = np.array([1.0, 0.0, 0.15])
        ev = np.array([0.0, 1.0, 0.4])
        pts = origin + u[:, None] * eu + v[:, None] * ev
    else:
        pts = np.stack(
            [rng.uniform(-15, 15, n), rng.uniform(-4, 4, n), rng.uniform(8, 50, n)],
            axis=1,
        )
    w = np.array([0.02, 0.05, -0.01])
    t = np.array([-0.6, 0.1, 1.2])
    t /= np.linalg.norm(t)
    R = cv2.Rodrigues(w)[0]
    return pts, R, w, t


def _sampson(E, x0, x1):
    X0 = np.concatenate([x0, np.ones((len(x0), 1))], axis=1)
    X1 = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)
    Ex0 = X0 @ E.T
    Etx1 = X1 @ E
    num = np.sum(X1 * Ex0, axis=1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / np.maximum(den, 1e-12)


class TestFivePointMinimal:
    def test_null_basis_spans_null_space(self, rng):
        # random rank-5 9x9 PSD batch: AtA from 5 random rows
        A = rng.normal(0, 1, (16, 5, 9)).astype(np.float32)
        AtA = jnp.einsum("hni,hnj->hij", A, A)
        V = np.asarray(null_basis(AtA, 4))
        # columns orthonormal
        G = np.einsum("hik,hil->hkl", V, V)
        assert np.abs(G - np.eye(4)).max() < 1e-4
        # and in the (near-)null space: ||A v|| small relative to ||A||
        Av = np.einsum("hni,hik->hnk", A, V)
        assert np.abs(Av).max() < 1e-3

    def test_noiseless_minimal_sets(self, rng):
        """On exact 5-point samples, some candidate must satisfy the
        epipolar constraint for held-out points of the same motion."""
        pts, R, w, t = _scene(rng, 40)
        uv0 = _project(pts, np.zeros(3), np.zeros(3))
        uv1 = _project(pts, w, t)
        x0, x1 = _normalized(uv0), _normalized(uv1)

        H = 64
        idx = np.stack([rng.choice(40, 5, replace=False) for _ in range(H)])
        E, ok = five_point_candidates(
            jnp.asarray(x0[idx]), jnp.asarray(x1[idx])
        )
        E, ok = np.asarray(E), np.asarray(ok)
        assert ok.any(axis=1).mean() > 0.9  # nearly every sample yields roots

        best = np.full(H, np.inf)
        for h in range(H):
            for r in range(10):
                if not ok[h, r]:
                    continue
                d = _sampson(E[h, r], x0, x1)  # all 40 points
                best[h] = min(best[h], float(np.max(d)))
        # 1 px at f=719 -> 1.9e-6 in normalized-squared units. A "good"
        # sample classifies every point of the true motion as an inlier;
        # f32 Gauss-Jordan noise loses ~15% of samples (measured), which
        # RANSAC absorbs — require well above the floor with margin.
        assert (best < 2e-7).mean() >= 0.6, f"exact-candidate rate {(best < 2e-7).mean()}"
        assert (best < 1.9e-6).mean() >= 0.7, f"inlier-grade rate {(best < 1.9e-6).mean()}"

    def test_planar_scene_ransac(self, rng):
        """Planar scenes: 5-point RANSAC must still recover the pose
        (8-point is degenerate here — the least-squares null space mixes
        E with the homography-compatible family)."""
        pts, R_true, w, t_true = _scene(rng, 250, planar=True)
        uv0 = _project(pts, np.zeros(3), np.zeros(3)) + rng.normal(0, 0.2, (250, 2))
        uv1 = _project(pts, w, t_true) + rng.normal(0, 0.2, (250, 2))

        cfg = VOConfig(essential_solver="5point", essential_hypotheses=256)
        res = estimate_essential_ransac(
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            jnp.ones(250, dtype=bool),
            jnp.asarray(K),
            cfg,
            jax.random.key(3),
        )
        assert bool(res.ok)
        assert int(res.num_inliers) > 200
        R, t = recover_pose(
            res.E,
            jnp.asarray(uv0, jnp.float32),
            jnp.asarray(uv1, jnp.float32),
            res.inliers,
            jnp.asarray(K),
        )
        R, t = np.asarray(R), np.asarray(t)
        ang = np.degrees(np.arccos(np.clip((np.trace(R_true.T @ R) - 1) / 2, -1, 1)))
        assert ang < 0.5, f"rotation error {ang} deg on planar scene"
        assert float(np.dot(t, t_true)) > 0.995
