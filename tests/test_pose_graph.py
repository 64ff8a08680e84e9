"""Pose-graph smoothing tests: se3 log roundtrip, chain smoothing."""

import numpy as np
import cv2
import jax.numpy as jnp

from visualodometry_tpu.ba.pose_graph import (
    PoseGraph,
    pose_graph_cost,
    se3_log,
    smooth_pose_graph,
)
from visualodometry_tpu.geometry.se3 import se3_exp, se3_inverse


class TestSE3Log:
    def test_roundtrip(self, rng):
        xi = rng.normal(0, 0.5, (20, 6)).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        xi_rec = np.asarray(se3_log(T))
        np.testing.assert_allclose(xi_rec, xi, atol=1e-4)

    def test_identity(self):
        assert np.allclose(np.asarray(se3_log(jnp.eye(4))), 0.0, atol=1e-6)


def _chain(rng, P=12, noise_rot=0.01, noise_t=0.05):
    """Ground-truth chain + noisy absolute estimates + clean rel edges."""
    T_gt = [np.eye(4, dtype=np.float32)]
    for p in range(1, P):
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = cv2.Rodrigues(np.array([0.0, 0.02, 0.0]))[0]
        d[:3, 3] = [0.05, 0.0, 1.0]
        T_gt.append((T_gt[-1] @ d).astype(np.float32))
    T_gt = np.stack(T_gt)

    # noisy absolute poses (except pose 0)
    T_noisy = T_gt.copy()
    for p in range(1, P):
        xi = np.concatenate(
            [rng.normal(0, noise_t, 3), rng.normal(0, noise_rot, 3)]
        ).astype(np.float32)
        T_noisy[p] = np.asarray(
            jnp.matmul(T_gt[p], se3_exp(jnp.asarray(xi)))
        )

    # exact relative measurements from GT (consecutive + skip-2)
    ei, ej, Z = [], [], []
    for p in range(P - 1):
        ei.append(p)
        ej.append(p + 1)
        Z.append(np.asarray(se3_inverse(jnp.asarray(T_gt[p])) @ T_gt[p + 1]))
    for p in range(P - 2):
        ei.append(p)
        ej.append(p + 2)
        Z.append(np.asarray(se3_inverse(jnp.asarray(T_gt[p])) @ T_gt[p + 2]))
    return T_gt, T_noisy, np.array(ei), np.array(ej), np.stack(Z)


class TestSmoothing:
    def test_recovers_chain(self, rng):
        T_gt, T_noisy, ei, ej, Z = _chain(rng)
        g = PoseGraph(
            T_wc=jnp.asarray(T_noisy),
            edges_i=jnp.asarray(ei, jnp.int32),
            edges_j=jnp.asarray(ej, jnp.int32),
            Z=jnp.asarray(Z),
            weight=jnp.ones(len(ei), jnp.float32),
        )
        cost0 = float(pose_graph_cost(g))
        T_ref = smooth_pose_graph(g, iters=10)
        cost1 = float(pose_graph_cost(g._replace(T_wc=T_ref)))
        assert cost1 < 1e-4 * max(cost0, 1e-8)
        err = np.linalg.norm(
            np.asarray(T_ref)[:, :3, 3] - T_gt[:, :3, 3], axis=1
        )
        assert err.max() < 1e-2, err

    def test_zero_weight_edges_ignored(self, rng):
        T_gt, T_noisy, ei, ej, Z = _chain(rng, P=6)
        # corrupt one measurement but zero its weight
        Z_bad = Z.copy()
        Z_bad[2][:3, 3] += 5.0
        w = np.ones(len(ei), np.float32)
        w[2] = 0.0
        g = PoseGraph(
            T_wc=jnp.asarray(T_noisy),
            edges_i=jnp.asarray(ei, jnp.int32),
            edges_j=jnp.asarray(ej, jnp.int32),
            Z=jnp.asarray(Z_bad),
            weight=jnp.asarray(w),
        )
        T_ref = smooth_pose_graph(g, iters=10)
        err = np.linalg.norm(
            np.asarray(T_ref)[:, :3, 3] - T_gt[:, :3, 3], axis=1
        )
        assert err.max() < 2e-2
