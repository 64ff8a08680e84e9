"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4).

- distributed Schur BA must match the single-device solver numerically;
- multi-sequence DP must match per-sequence serial execution.
"""

import pytest
import numpy as np
import cv2
import jax
import jax.numpy as jnp

from visualodometry_tpu.ba import BAProblem, ba_solve
from visualodometry_tpu.ba.solver import ba_cost
from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state, make_step_fn
from visualodometry_tpu.data.synthetic import make_scene, render_features
from visualodometry_tpu.parallel import ba_solve_distributed, make_mesh
from visualodometry_tpu.parallel.multiseq import (
    init_batched_state,
    make_multiseq_step_fn,
)

K = np.array(
    [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]], dtype=np.float32
)


def _ba_problem(rng, P=5, L=256, noise=0.2):
    X = np.stack(
        [rng.uniform(-15, 15, L), rng.uniform(-4, 3, L), rng.uniform(10, 50, L)],
        axis=1,
    ).astype(np.float32)
    T_cw, uv = [], np.zeros((L, P, 2), np.float32)
    mask = np.ones((L, P), bool)
    for p in range(P):
        w = np.array([0.0, 0.002 * p, 0.0])
        t = np.array([0.05 * p, 0.0, -1.2 * p])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = cv2.Rodrigues(w)[0]
        T[:3, 3] = t
        T_cw.append(T)
        proj, _ = cv2.projectPoints(
            X.astype(np.float64), w, t, K.astype(np.float64), None
        )
        uv[:, p] = proj.reshape(-1, 2)
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    X_pert = X + rng.normal(0, 0.3, X.shape).astype(np.float32)
    return BAProblem(
        T_cw=jnp.asarray(np.stack(T_cw)),
        X=jnp.asarray(X_pert),
        uv=jnp.asarray(uv),
        mask=jnp.asarray(mask),
        K=jnp.asarray(K),
    )


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        prob = _ba_problem(rng)
        mesh = make_mesh(num_seq=1, num_map=8)
        ref = ba_solve(prob, iters=6, damping=1e-4)
        dist = ba_solve_distributed(prob, mesh, iters=6, damping=1e-4)
        np.testing.assert_allclose(
            np.asarray(dist.T_cw), np.asarray(ref.T_cw), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dist.X), np.asarray(ref.X), rtol=1e-3, atol=1e-3
        )
        assert float(ba_cost(dist)) < 0.3

    def test_2d_mesh(self, rng):
        # map axis of 4 with a seq axis of 2 present: BA replicates over seq
        prob = _ba_problem(rng, L=128)
        mesh = make_mesh(num_seq=2, num_map=4)
        dist = ba_solve_distributed(prob, mesh, iters=4, damping=1e-4)
        ref = ba_solve(prob, iters=4, damping=1e-4)
        np.testing.assert_allclose(
            np.asarray(dist.T_cw), np.asarray(ref.T_cw), rtol=1e-4, atol=1e-4
        )


class TestMultiSequence:
    @pytest.mark.slow
    def test_matches_serial(self):
        B = 8
        n_slots = 256
        cfg = VOConfig(
            extractor_type="synthetic",
            max_keypoints=n_slots,
            sift_n_features=n_slots,
            min_median_flow=3.0,
            pnp_reproj_err=2.0,
            essential_hypotheses=128,
            pnp_hypotheses=128,
            map_capacity=1024,
            # this test checks the multi-sequence MACHINERY (vmapped step +
            # sharding) against serial execution; pin the solver-agnostic
            # config to the 8-point path, whose batched-vs-serial f32
            # summation differences stay inside the pose tolerance. The
            # 5-point chain (Durand-Kerner + GN polish) amplifies layout
            # round-off past any meaningful tolerance for a chaotic
            # state machine; its correctness is covered by
            # tests/test_fivepoint.py and the single-sequence e2e tests.
            essential_solver="8point",
        )
        scenes, feat_seqs = [], []
        for b in range(B):
            rng_b = np.random.default_rng(100 + b)
            scene = make_scene(
                rng_b, num_frames=6, speed=1.2, num_landmarks=1500
            )
            scenes.append(scene)
            feat_seqs.append(
                [
                    render_features(scene, f, n_slots, rng_b, pixel_noise=0.2)
                    for f in range(6)
                ]
            )

        mesh = make_mesh(num_seq=8, num_map=1)
        Kj = jnp.asarray(K)
        mstep = make_multiseq_step_fn(cfg, Kj, mesh)
        mstate = init_batched_state(cfg, 128, B)

        # serial reference: same per-sequence seeds
        step = jax.jit(make_step_fn(cfg, Kj))
        sstates = [
            init_state(cfg, 128, seed=cfg.seed + b) for b in range(B)
        ]

        for f in range(6):
            batch_feats = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fs[f] for fs in feat_seqs]
            )
            mstate, mout = mstep(mstate, batch_feats)
            for b in range(B):
                sstates[b], sout = step(sstates[b], feat_seqs[b][f])
                # batched matmul summation order can flip RANSAC decisions
                # at inlier-threshold boundaries, so require behavioral
                # equivalence rather than bitwise equality
                assert bool(mout.initialized[b]) == bool(sout.initialized)
                np.testing.assert_allclose(
                    np.asarray(mout.T_wc[b]),
                    np.asarray(sout.T_wc),
                    atol=0.15,
                )

    @pytest.mark.slow
    def test_fivepoint_behavioral_equivalence(self):
        """Default (5-point) solver under vmap vs serial (VERDICT r1 #7).

        The Durand-Kerner + GN chain amplifies batched-layout round-off,
        so iterated rollouts diverge chaotically and bitwise comparison
        is meaningless. Instead the serial states are RESYNCED into the
        batched state before every frame: each batched step then sees
        bit-identical inputs to its serial twin, and the assertion is
        behavioral — same branch decisions, rotation within a 2-degree
        cone, translation within 10% of the motion scale.
        """
        B = 8
        n_slots = 256
        cfg = VOConfig(
            extractor_type="synthetic",
            max_keypoints=n_slots,
            sift_n_features=n_slots,
            min_median_flow=3.0,
            pnp_reproj_err=2.0,
            essential_hypotheses=128,
            pnp_hypotheses=128,
            map_capacity=1024,
            essential_solver="5point",  # the default solver, on purpose
        )
        feat_seqs = []
        for b in range(B):
            rng_b = np.random.default_rng(200 + b)
            scene = make_scene(
                rng_b, num_frames=5, speed=1.2, num_landmarks=1500
            )
            feat_seqs.append(
                [
                    render_features(scene, f, n_slots, rng_b, pixel_noise=0.2)
                    for f in range(5)
                ]
            )

        mesh = make_mesh(num_seq=8, num_map=1)
        Kj = jnp.asarray(K)
        mstep = make_multiseq_step_fn(cfg, Kj, mesh)
        step = jax.jit(make_step_fn(cfg, Kj))
        sstates = [init_state(cfg, 128, seed=cfg.seed + b) for b in range(B)]

        checked_tracking = 0
        for f in range(5):
            # resync: batched state := stack of the serial states
            mstate = jax.tree.map(
                lambda *xs: jnp.stack(xs), *sstates
            )
            batch_feats = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fs[f] for fs in feat_seqs]
            )
            _, mout = mstep(mstate, batch_feats)
            for b in range(B):
                sstates[b], sout = step(sstates[b], feat_seqs[b][f])
                assert bool(mout.initialized[b]) == bool(sout.initialized)
                assert bool(mout.did_reset[b]) == bool(sout.did_reset)
                if not bool(sout.initialized):
                    continue
                R_m = np.asarray(mout.T_wc[b])[:3, :3]
                R_s = np.asarray(sout.T_wc)[:3, :3]
                cos = (np.trace(R_m.T @ R_s) - 1.0) / 2.0
                angle_deg = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
                assert angle_deg < 2.0, (f, b, angle_deg)
                t_m = np.asarray(mout.T_wc[b])[:3, 3]
                t_s = np.asarray(sout.T_wc)[:3, 3]
                scale = max(np.linalg.norm(t_s), 1.0)
                assert np.linalg.norm(t_m - t_s) < 0.1 * scale, (f, b)
                checked_tracking += 1
        assert checked_tracking >= B  # the cone check genuinely ran
