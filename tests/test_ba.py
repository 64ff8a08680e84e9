"""Tests for the sliding-window BA solver and window assembly."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from visualodometry_tpu.ba import BAProblem, ba_solve
from visualodometry_tpu.ba.solver import ba_cost
from visualodometry_tpu.ba.window import assemble_window, write_back
from visualodometry_tpu.core.state import MapState

K = np.array(
    [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]], dtype=np.float32
)


def _window_scene(rng, P=5, L=200, noise=0.2):
    """P cameras moving forward, L landmarks, full observation grid."""
    X = np.stack(
        [rng.uniform(-15, 15, L), rng.uniform(-4, 3, L), rng.uniform(10, 50, L)],
        axis=1,
    )
    T_cw = []
    uv = np.zeros((L, P, 2))
    mask = np.ones((L, P), dtype=bool)
    for p in range(P):
        w = np.array([0.0, 0.002 * p, 0.0])
        t = np.array([0.05 * p, 0.0, -1.2 * p])  # camera moving +z in world
        R = cv2.Rodrigues(w)[0]
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        T_cw.append(T)
        proj, _ = cv2.projectPoints(X, w, t, K.astype(np.float64), None)
        uv[:, p] = proj.reshape(-1, 2)
        pc = X @ R.T + t
        mask[:, p] = pc[:, 2] > 1.0
    uv += rng.normal(0, noise, uv.shape)
    return np.stack(T_cw).astype(np.float32), X.astype(np.float32), uv.astype(
        np.float32
    ), mask


class TestBASolver:
    def test_converges_from_perturbation(self, rng):
        T_cw, X, uv, mask = _window_scene(rng, noise=0.0)
        # perturb poses (except the two gauge/scale-fixed ones) and landmarks
        T_pert = T_cw.copy()
        for p in range(2, len(T_cw)):
            dw = rng.normal(0, 0.01, 3)
            dt = rng.normal(0, 0.15, 3)
            dT = np.eye(4)
            dT[:3, :3] = cv2.Rodrigues(dw)[0]
            dT[:3, 3] = dt
            T_pert[p] = (dT @ T_cw[p]).astype(np.float32)
        X_pert = X + rng.normal(0, 0.3, X.shape).astype(np.float32)

        prob = BAProblem(
            T_cw=jnp.asarray(T_pert),
            X=jnp.asarray(X_pert),
            uv=jnp.asarray(uv),
            mask=jnp.asarray(mask),
            K=jnp.asarray(K),
        )
        cost0 = float(ba_cost(prob))
        solved = jax.jit(lambda p: ba_solve(p, iters=10, damping=1e-4))(prob)
        cost1 = float(ba_cost(solved))
        assert cost0 > 1.0
        assert cost1 < 1e-2, f"cost {cost0} -> {cost1}"
        # poses recovered exactly (gauge + scale pinned by two fixed poses)
        T_out = np.asarray(solved.T_cw)
        for p in range(2, len(T_cw)):
            assert np.linalg.norm(T_out[p, :3, 3] - T_cw[p, :3, 3]) < 2e-2

    def test_noise_floor(self, rng):
        T_cw, X, uv, mask = _window_scene(rng, noise=0.3)
        prob = BAProblem(
            T_cw=jnp.asarray(T_cw),
            X=jnp.asarray(X + rng.normal(0, 0.2, X.shape).astype(np.float32)),
            uv=jnp.asarray(uv),
            mask=jnp.asarray(mask),
            K=jnp.asarray(K),
        )
        solved = jax.jit(lambda p: ba_solve(p, iters=8, damping=1e-4))(prob)
        # converges to roughly the injected pixel noise variance (2 dof)
        cost = float(ba_cost(solved))
        assert cost < 0.3

    def test_unobserved_landmarks_untouched(self, rng):
        T_cw, X, uv, mask = _window_scene(rng, L=50, noise=0.0)
        mask[10:20] = False  # fully unobserved
        X_in = X + rng.normal(0, 0.2, X.shape).astype(np.float32)
        prob = BAProblem(
            T_cw=jnp.asarray(T_cw),
            X=jnp.asarray(X_in),
            uv=jnp.asarray(uv),
            mask=jnp.asarray(mask),
            K=jnp.asarray(K),
        )
        solved = ba_solve(prob, iters=3, damping=1e-4)
        np.testing.assert_array_equal(
            np.asarray(solved.X)[10:20], X_in[10:20]
        )


class TestWindowAssembly:
    def test_assemble_and_writeback(self, rng):
        P_kf, N, L, M = 3, 64, 32, 256
        # map with 40 landmarks
        n_lm = 40
        pts = rng.normal(size=(n_lm, 3)).astype(np.float32)
        map_state = MapState(
            points=jnp.zeros((M, 3), jnp.float32).at[jnp.arange(n_lm)].set(
                jnp.asarray(pts)
            ),
            ids=jnp.full((M,), -1, jnp.int32).at[jnp.arange(n_lm)].set(
                jnp.arange(n_lm, dtype=jnp.int32)
            ),
            next_id=jnp.int32(n_lm),
        )
        # keyframes observing subsets
        kf_ids = np.full((P_kf, N), -1, np.int32)
        kf_valid = np.zeros((P_kf, N), bool)
        kf_kps = rng.uniform(0, 500, (P_kf, N, 2)).astype(np.float32)
        for p in range(P_kf):
            ids_here = rng.choice(n_lm, 30, replace=False)
            kf_ids[p, :30] = ids_here
            kf_valid[p, :30] = True
        kf_T_wc = np.broadcast_to(np.eye(4, dtype=np.float32), (P_kf, 4, 4))

        prob, chosen = assemble_window(
            jnp.asarray(kf_T_wc.copy()),
            jnp.asarray(kf_kps),
            jnp.asarray(kf_ids),
            jnp.asarray(kf_valid),
            map_state,
            jnp.asarray(K),
            num_landmarks=L,
        )
        chosen = np.asarray(chosen)
        mask = np.asarray(prob.mask)
        uv = np.asarray(prob.uv)
        # every chosen id comes from the newest keyframe
        newest = set(kf_ids[-1][kf_valid[-1]].tolist())
        for l, cid in enumerate(chosen):
            if cid < 0:
                continue
            assert cid in newest
            for p in range(P_kf):
                where = np.where(kf_ids[p] == cid)[0]
                if len(where):
                    assert mask[l, p]
                    np.testing.assert_allclose(uv[l, p], kf_kps[p, where[0]])
                else:
                    assert not mask[l, p]

        # write back shifted landmarks and check scatter
        X_new = np.asarray(prob.X) + 1.0
        map2 = write_back(map_state, jnp.asarray(chosen), jnp.asarray(X_new))
        for l, cid in enumerate(chosen):
            if cid >= 0:
                np.testing.assert_allclose(
                    np.asarray(map2.points)[cid], X_new[l], rtol=1e-6
                )


class TestScalePrior:
    def test_radial_prior_pins_scale_direction(self, rng):
        """ScalePrior (ba/solver.py): with a radial scale perturbation of
        the newest pose, the prior-constrained solve must recover the
        pre-solve distance-from-gauge within its relative sigma while
        still reducing reprojection cost (the unconstrained solve on
        weakly-observable windows can keep metre-scale radial slides -
        the r2 reason pose correction defaulted off)."""
        T_cw, X, uv, mask = _window_scene(rng, P=5, L=200, noise=0.1)
        prob = BAProblem(
            T_cw=jnp.asarray(T_cw),
            X=jnp.asarray(X + rng.normal(0, 0.05, X.shape).astype(np.float32)),
            uv=jnp.asarray(uv),
            mask=jnp.asarray(mask),
            K=jnp.asarray(K),
        )

        def dist_from_gauge(T):
            T = np.asarray(T)
            c = -np.einsum("pji,pj->pi", T[:, :3, :3], T[:, :3, 3])
            return np.linalg.norm(c - c[0], axis=-1)

        d_pre = dist_from_gauge(prob.T_cw)
        c0_pre = float(ba_cost(prob))
        solved = jax.jit(
            lambda p: ba_solve(p, iters=8, damping=1e-4, scale_prior_rel=0.02)
        )(prob)
        d_post = dist_from_gauge(solved.T_cw)
        # reprojection cost must still drop (the prior is radial-only)
        assert float(ba_cost(solved)) < c0_pre
        # free poses keep their distance-from-gauge within ~2 sigma
        rel = np.abs(d_post[2:] - d_pre[2:]) / d_pre[2:]
        assert (rel < 0.05).all(), rel
