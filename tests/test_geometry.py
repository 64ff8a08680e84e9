"""Unit tests for the geometry core vs. closed-form and OpenCV oracles.

OpenCV is available in the test environment and is used ONLY as an oracle
(the compute path is pure JAX) — mirroring SURVEY.md §4's unit-test plan:
geometry kernels vs. known answers.
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.geometry import (
    make_T,
    project_points_T,
    se3_inverse,
    smallest_eigvec,
    so3_exp,
    so3_hat,
    so3_log,
    svd3,
    triangulate_points,
)
from visualodometry_tpu.geometry.camera import (
    pixels_to_normalized,
    projection_jacobian_point,
)
from visualodometry_tpu.geometry.se3 import se3_exp, transform_points
from visualodometry_tpu.geometry.so3 import rotation_angle
from visualodometry_tpu.geometry.triangulation import triangulate_dlt

K_KITTI = np.array(
    [[7.18856e02, 0, 6.071928e02], [0, 7.18856e02, 1.852157e02], [0, 0, 1]],
    dtype=np.float32,
)


class TestSO3:
    def test_exp_matches_rodrigues(self, rng):
        w = rng.normal(size=(50, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        for i in range(50):
            R_cv, _ = cv2.Rodrigues(w[i].astype(np.float64))
            np.testing.assert_allclose(R[i], R_cv, atol=1e-5)

    def test_log_matches_rodrigues(self, rng):
        w = rng.normal(size=(50, 3)).astype(np.float64)
        # keep angles below pi to stay in the principal branch
        w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(
            0.01, 3.0, size=(50, 1)
        )
        Rs = np.stack([cv2.Rodrigues(wi)[0] for wi in w])
        w_rec = np.asarray(so3_log(jnp.asarray(Rs.astype(np.float32))))
        np.testing.assert_allclose(w_rec, w, atol=1e-4)

    def test_exp_log_roundtrip_small(self):
        w = jnp.array([[1e-7, -2e-7, 5e-8], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(so3_log(R)), np.asarray(w), atol=1e-7)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = (np.pi - 1e-5) * axis
        R = cv2.Rodrigues(w)[0].astype(np.float32)
        w_rec = np.asarray(so3_log(jnp.asarray(R)))
        np.testing.assert_allclose(w_rec, w, atol=1e-3)

    def test_hat_antisymmetric(self, rng):
        w = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        W = so3_hat(w)
        np.testing.assert_allclose(
            np.asarray(W), -np.asarray(jnp.swapaxes(W, -1, -2)), atol=1e-7
        )

    def test_rotation_angle(self, rng):
        for _ in range(10):
            w = rng.normal(size=3)
            theta = np.linalg.norm(w)
            if theta > np.pi:
                continue
            R = cv2.Rodrigues(w)[0].astype(np.float32)
            assert abs(float(rotation_angle(jnp.asarray(R))) - theta) < 1e-4


class TestSE3:
    def test_inverse(self, rng):
        w = rng.normal(size=(8, 3)).astype(np.float32)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        T = make_T(so3_exp(jnp.asarray(w)), jnp.asarray(t))
        TT = np.asarray(jnp.matmul(T, se3_inverse(T), precision="highest"))
        np.testing.assert_allclose(TT, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)

    def test_exp_identity(self):
        T = se3_exp(jnp.zeros(6, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)

    def test_exp_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
        T = np.asarray(se3_exp(xi))
        np.testing.assert_allclose(T[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_transform_points(self, rng):
        w = rng.normal(size=3).astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        T = make_T(so3_exp(jnp.asarray(w)), jnp.asarray(t))
        out = np.asarray(transform_points(T, jnp.asarray(pts)))
        R = cv2.Rodrigues(w.astype(np.float64))[0]
        expected = (R @ pts.T).T + t
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestCamera:
    def test_projection_matches_opencv(self, rng):
        w = rng.normal(size=3) * 0.3
        t = rng.normal(size=3)
        pts = rng.uniform(-5, 5, size=(40, 3))
        pts[:, 2] = rng.uniform(4, 30, size=40)
        R = cv2.Rodrigues(w)[0]
        uv_cv, _ = cv2.projectPoints(pts, w, t, K_KITTI.astype(np.float64), None)
        uv_cv = uv_cv.reshape(-1, 2)

        T_cw = make_T(
            jnp.asarray(R.astype(np.float32)), jnp.asarray(t.astype(np.float32))
        )
        uv, z = project_points_T(
            jnp.asarray(pts.astype(np.float32)), T_cw, jnp.asarray(K_KITTI)
        )
        # keep only points that land in front of the camera for comparison
        mask = np.asarray(z) > 0
        np.testing.assert_allclose(np.asarray(uv)[mask], uv_cv[mask], atol=0.05)

    def test_pixels_to_normalized_roundtrip(self, rng):
        uv = rng.uniform(0, 1000, size=(30, 2)).astype(np.float32)
        xy = pixels_to_normalized(jnp.asarray(uv), jnp.asarray(K_KITTI))
        # re-project: u = fx x + cx
        u = K_KITTI[0, 0] * np.asarray(xy)[:, 0] + K_KITTI[0, 2]
        v = K_KITTI[1, 1] * np.asarray(xy)[:, 1] + K_KITTI[1, 2]
        np.testing.assert_allclose(np.stack([u, v], -1), uv, rtol=1e-5)

    def test_projection_jacobian_matches_autodiff(self, rng):
        pts = rng.uniform(1, 10, size=(5, 3)).astype(np.float32)
        K = jnp.asarray(K_KITTI)

        def proj_single(p):
            from visualodometry_tpu.geometry.camera import project_points

            uv, _ = project_points(p[None], K)
            return uv[0]

        J_auto = jax.vmap(jax.jacobian(proj_single))(jnp.asarray(pts))
        J_analytic = projection_jacobian_point(jnp.asarray(pts), K)
        np.testing.assert_allclose(
            np.asarray(J_analytic), np.asarray(J_auto), rtol=1e-4, atol=1e-4
        )


class TestLinalg:
    def test_smallest_eigvec(self, rng):
        A = rng.normal(size=(10, 6, 4)).astype(np.float32)
        M = np.einsum("bij,bik->bjk", A, A)
        v = np.asarray(smallest_eigvec(jnp.asarray(M)))
        for i in range(10):
            wv, Vv = np.linalg.eigh(M[i])
            ref = Vv[:, 0]
            # eigenvectors defined up to sign
            assert min(
                np.linalg.norm(v[i] - ref), np.linalg.norm(v[i] + ref)
            ) < 1e-3

    def test_svd3_reconstruction(self, rng):
        E = rng.normal(size=(20, 3, 3)).astype(np.float32)
        U, s, Vt = svd3(jnp.asarray(E))
        U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
        rec = np.einsum("bij,bj,bjk->bik", U, s, Vt)
        np.testing.assert_allclose(rec, E, atol=1e-3)
        # orthogonality
        np.testing.assert_allclose(
            np.einsum("bij,bik->bjk", U, U),
            np.broadcast_to(np.eye(3), (20, 3, 3)),
            atol=1e-4,
        )

    def test_svd3_rank2(self, rng):
        # essential-like rank-2 matrix: s3 must come out ~0, U still orthogonal
        R = cv2.Rodrigues(rng.normal(size=3))[0]
        t = rng.normal(size=3)
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = (tx @ R).astype(np.float32)
        U, s, Vt = svd3(jnp.asarray(E[None]))
        s = np.asarray(s)[0]
        assert s[2] < 1e-3 * s[0]  # f32 eigh noise floor
        U = np.asarray(U)[0]
        np.testing.assert_allclose(U @ U.T, np.eye(3), atol=1e-4)


class TestTriangulation:
    def _make_views(self, rng, n=100):
        pts = np.stack(
            [
                rng.uniform(-10, 10, n),
                rng.uniform(-3, 3, n),
                rng.uniform(8, 40, n),
            ],
            axis=1,
        )
        T1 = np.eye(4)
        R2 = cv2.Rodrigues(np.array([0.0, 0.05, 0.0]))[0]
        t2 = np.array([-1.5, 0.0, 0.3])
        T2 = np.eye(4)
        T2[:3, :3] = R2
        T2[:3, 3] = t2
        uv1, _ = cv2.projectPoints(
            pts, np.zeros(3), np.zeros(3), K_KITTI.astype(np.float64), None
        )
        uv2, _ = cv2.projectPoints(
            pts, cv2.Rodrigues(R2)[0], t2, K_KITTI.astype(np.float64), None
        )
        return pts, T1, T2, uv1.reshape(-1, 2), uv2.reshape(-1, 2)

    def test_dlt_matches_opencv(self, rng):
        pts, T1, T2, uv1, uv2 = self._make_views(rng)
        P1 = K_KITTI.astype(np.float64) @ T1[:3]
        P2 = K_KITTI.astype(np.float64) @ T2[:3]
        X_cv = cv2.triangulatePoints(P1, P2, uv1.T, uv2.T)
        X_cv = (X_cv[:3] / X_cv[3]).T
        X = np.asarray(
            triangulate_dlt(
                jnp.asarray(P1.astype(np.float32)),
                jnp.asarray(P2.astype(np.float32)),
                jnp.asarray(uv1.astype(np.float32)),
                jnp.asarray(uv2.astype(np.float32)),
            )
        )
        np.testing.assert_allclose(X, X_cv, atol=0.05)
        np.testing.assert_allclose(X, pts, atol=0.05)

    def test_gates(self, rng):
        pts, T1, T2, uv1, uv2 = self._make_views(rng, n=50)
        cfg = VOConfig(max_reproj_err=2.0, min_depth=0.001)
        # corrupt 10 correspondences
        uv2_bad = uv2.copy()
        uv2_bad[:10] += rng.uniform(20, 40, size=(10, 2))
        X, valid = triangulate_points(
            jnp.asarray(T1.astype(np.float32)),
            jnp.asarray(T2.astype(np.float32)),
            jnp.asarray(uv1.astype(np.float32)),
            jnp.asarray(uv2_bad.astype(np.float32)),
            jnp.asarray(K_KITTI),
            cfg,
        )
        valid = np.asarray(valid)
        assert valid[10:].all()
        assert not valid[:10].any()
        np.testing.assert_allclose(np.asarray(X)[valid], pts[valid], atol=0.5)

    def test_behind_camera_rejected(self, rng):
        cfg = VOConfig()
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[0, 3] = 1.0
        # a point behind both cameras projects to some pixels; construct
        # matching pixels from a behind-camera point directly
        pt = np.array([[0.5, 0.2, -5.0]])
        uv1, _ = cv2.projectPoints(
            pt, np.zeros(3), np.zeros(3), K_KITTI.astype(np.float64), None
        )
        uv2, _ = cv2.projectPoints(
            pt, np.zeros(3), np.array([1.0, 0, 0.0]), K_KITTI.astype(np.float64), None
        )
        _, valid = triangulate_points(
            jnp.asarray(T1),
            jnp.asarray(T2),
            jnp.asarray(uv1.reshape(-1, 2).astype(np.float32)),
            jnp.asarray(uv2.reshape(-1, 2).astype(np.float32)),
            jnp.asarray(K_KITTI),
            cfg,
        )
        assert not bool(np.asarray(valid)[0])


class TestEvalExtras:
    def test_rpe(self, rng):
        from visualodometry_tpu.eval.ate import rpe_rmse

        gt = np.cumsum(rng.normal(0, 1, (50, 3)), axis=0)
        est = gt + rng.normal(0, 0.01, gt.shape)
        assert rpe_rmse(est, gt, delta=1) < 0.05
        assert rpe_rmse(gt, gt, delta=5) == 0.0

    def test_masked_median_matches_numpy(self, rng):
        import jax.numpy as jnp

        from visualodometry_tpu.core.step import masked_median

        for n_valid in [1, 2, 7, 8, 31]:
            x = rng.normal(size=64).astype(np.float32)
            mask = np.zeros(64, bool)
            sel = rng.choice(64, n_valid, replace=False)
            mask[sel] = True
            got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
            want = float(np.median(x[mask]))
            assert abs(got - want) < 1e-5, (n_valid, got, want)

    def test_masked_median_empty(self):
        import jax.numpy as jnp

        from visualodometry_tpu.core.step import masked_median

        assert float(masked_median(jnp.ones(8), jnp.zeros(8, bool))) == 0.0
