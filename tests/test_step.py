"""Integration tests: the jitted VO step on synthetic trajectories.

Per SURVEY.md §4: a synthetic generator (known K, poses, landmarks ->
keypoint tracks with controlled noise) drives the full state machine and
ATE is asserted against the generating trajectory. Like the reference,
a tracking failure resets the system and the trajectory restarts near the
origin (reference: src/modules/vo.py:290-299), so ATE is evaluated on the
longest reset-free tracked segment.
"""

import numpy as np
import jax
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state, make_step_fn
from visualodometry_tpu.data.synthetic import make_scene, render_features
from visualodometry_tpu.eval import ate_rmse
from visualodometry_tpu.frontend.interface import pad_features

N_SLOTS = 512


def _cfg(**kw):
    base = dict(
        extractor_type="synthetic",
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        min_median_flow=3.0,
        max_reproj_err=4.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=4096,
        global_scale=20.0,
    )
    base.update(kw)
    return VOConfig(**base)


def _run_sequence(cfg, scene, feats_list):
    step = jax.jit(make_step_fn(cfg, scene.K))
    state = init_state(cfg, desc_dim=128)
    outs = []
    for feats in feats_list:
        state, out = step(state, feats)
        outs.append(jax.tree.map(np.asarray, out))
    return state, outs


def _segments(outs):
    """Contiguous initialized, reset-free frame index ranges."""
    segs, cur = [], []
    for i, o in enumerate(outs):
        if bool(o.initialized) and not bool(o.did_reset):
            cur.append(i)
        else:
            if cur:
                segs.append(cur)
            cur = []
    if cur:
        segs.append(cur)
    return segs


@pytest.mark.slow
class TestStepPipeline:
    @pytest.fixture(scope="class")
    def scene_and_run(self):
        rng = np.random.default_rng(7)
        cfg = _cfg()
        scene = make_scene(rng, num_frames=40, speed=1.2, turn_rate=0.003)
        feats = [
            render_features(scene, f, N_SLOTS, rng, pixel_noise=0.2)
            for f in range(scene.num_frames)
        ]
        state, outs = _run_sequence(cfg, scene, feats)
        return cfg, scene, state, outs

    def test_initializes_and_tracks(self, scene_and_run):
        cfg, scene, state, outs = scene_and_run
        init_frame = next(
            (i for i, o in enumerate(outs) if bool(o.initialized)), None
        )
        assert init_frame is not None and init_frame < 10
        segs = _segments(outs)
        # tracking holds for a long contiguous stretch
        assert max(len(s) for s in segs) >= 25
        # at most one failure/reset over the whole sequence
        assert sum(bool(o.did_reset) for o in outs) <= 1

    def test_map_populated(self, scene_and_run):
        cfg, scene, state, outs = scene_and_run
        # next_id is monotonic (survives resets): total landmarks ever made
        assert int(state.map.next_id) > 200
        tracked = [int(o.num_tracked) for o in outs if bool(o.initialized)]
        assert np.median(tracked[1:]) > 50

    def test_trajectory_ate(self, scene_and_run):
        cfg, scene, state, outs = scene_and_run
        est = np.stack([o.T_wc[:3, 3] for o in outs])
        gt = scene.gt_positions
        seg = max(_segments(outs), key=len)
        ate = ate_rmse(est[seg], gt[seg], align="sim3")
        # ~35+ m of travel on the segment; require ATE well under 1 m
        assert ate < 1.0, f"ATE {ate:.3f} m over {len(seg)} frames"

    def test_keyframes_created(self, scene_and_run):
        cfg, scene, state, outs = scene_and_run
        n_kf = sum(bool(o.is_keyframe) for o in outs)
        assert n_kf >= 2


class TestStepEdgeCases:
    def test_reset_on_garbage(self):
        rng = np.random.default_rng(3)
        cfg = _cfg()
        scene = make_scene(rng, num_frames=12, speed=1.2)
        feats = [render_features(scene, f, N_SLOTS, rng) for f in range(8)]
        # after tracking starts, feed frames with random descriptors
        for _ in range(4):
            kps = rng.uniform(0, 300, (N_SLOTS, 2)).astype(np.float32)
            desc = rng.normal(size=(N_SLOTS, 128)).astype(np.float32)
            desc /= np.linalg.norm(desc, axis=1, keepdims=True)
            feats.append(pad_features(kps, desc, N_SLOTS))
        state, outs = _run_sequence(cfg, scene, feats)
        assert any(bool(o.did_reset) for o in outs[8:])

    @pytest.mark.slow
    def test_waits_for_motion(self):
        rng = np.random.default_rng(5)
        cfg = _cfg(min_median_flow=20.0)
        scene = make_scene(rng, num_frames=6, speed=0.01)  # nearly static
        feats = [
            render_features(scene, f, N_SLOTS, rng)
            for f in range(scene.num_frames)
        ]
        state, outs = _run_sequence(cfg, scene, feats)
        assert not any(bool(o.initialized) for o in outs)

    def test_deterministic(self):
        rng = np.random.default_rng(11)
        cfg = _cfg()
        scene = make_scene(rng, num_frames=10, speed=1.2)
        feats = [
            render_features(scene, f, N_SLOTS, rng)
            for f in range(scene.num_frames)
        ]
        _, outs1 = _run_sequence(cfg, scene, feats)
        _, outs2 = _run_sequence(cfg, scene, feats)
        for o1, o2 in zip(outs1, outs2):
            np.testing.assert_array_equal(o1.T_wc, o2.T_wc)

    def test_recovers_after_reset(self):
        """After a garbage-induced reset, good frames re-initialize."""
        rng = np.random.default_rng(9)
        cfg = _cfg()
        scene = make_scene(rng, num_frames=30, speed=1.2)
        feats = [render_features(scene, f, N_SLOTS, rng) for f in range(8)]
        for _ in range(3):
            kps = rng.uniform(0, 300, (N_SLOTS, 2)).astype(np.float32)
            desc = rng.normal(size=(N_SLOTS, 128)).astype(np.float32)
            desc /= np.linalg.norm(desc, axis=1, keepdims=True)
            feats.append(pad_features(kps, desc, N_SLOTS))
        feats += [
            render_features(scene, f, N_SLOTS, rng) for f in range(11, 30)
        ]
        state, outs = _run_sequence(cfg, scene, feats)
        assert any(bool(o.did_reset) for o in outs[8:12])
        assert bool(outs[-1].initialized)


@pytest.mark.slow
class TestAttentionMatcherStep:
    def test_attention_matcher_tracks(self):
        """The step with matcher_type='attention' (identity-residual init)
        initializes and tracks the synthetic drive like the ratio path."""
        rng = np.random.default_rng(7)
        cfg = _cfg(matcher_type="attention", attention_depth=2)
        scene = make_scene(rng, num_frames=12, speed=1.2, turn_rate=0.003)
        feats = [
            render_features(scene, f, N_SLOTS, rng, pixel_noise=0.2)
            for f in range(scene.num_frames)
        ]
        state, outs = _run_sequence(cfg, scene, feats)
        assert any(bool(o.initialized) for o in outs)
        assert int(outs[-1].num_matches) > 100
