"""Integration tests for the KLT-tracking VO mode (candidate keypoints)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.klt_step import init_klt_state, make_klt_step_fn
from visualodometry_tpu.data.synthetic import make_scene, render_image
from visualodometry_tpu.eval import ate_rmse
from visualodometry_tpu.frontend.sift import extract_sift

N_SLOTS = 512
IMG = (512, 288)  # (W, H)


def _cfg(**kw):
    base = dict(
        extractor_type="sift",
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        sift_contrast_threshold=0.015,
        sift_num_octaves=3,
        min_median_flow=3.0,
        max_reproj_err=4.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=4096,
        klt_min_parallax_deg=0.6,
    )
    base.update(kw)
    return VOConfig(**base)


@pytest.mark.slow
class TestKLTStep:
    @pytest.fixture(scope="class")
    def run(self):
        rng = np.random.default_rng(3)
        cfg = _cfg()
        scene = make_scene(
            rng,
            num_frames=20,
            speed=1.0,
            turn_rate=0.002,
            num_landmarks=1400,
            image_size=IMG,
        )
        step = jax.jit(make_klt_step_fn(cfg, scene.K, (IMG[1], IMG[0])))
        state = init_klt_state(cfg, (IMG[1], IMG[0]))
        outs = []
        for f in range(scene.num_frames):
            img = jnp.asarray(render_image(scene, f, dot_sigma=2.0))
            feats = extract_sift(img, cfg)
            state, out = step(state, img, feats)
            outs.append(jax.tree.map(np.asarray, out))
        return cfg, scene, state, outs

    def test_initializes_and_tracks(self, run):
        cfg, scene, state, outs = run
        init_frame = next(
            (i for i, o in enumerate(outs) if bool(o.initialized)), None
        )
        assert init_frame is not None and init_frame < 10
        tail = outs[init_frame:]
        # KLT keeps a healthy track count every frame
        assert np.median([int(o.num_tracked) for o in tail]) > 100

    def test_candidates_promoted(self, run):
        cfg, scene, state, outs = run
        total_promoted = sum(int(o.num_promoted) for o in outs)
        assert total_promoted > 100
        # map actually holds the promoted landmarks
        assert int(state.map.next_id) == total_promoted

    def test_trajectory_sane(self, run):
        cfg, scene, state, outs = run
        init_frame = next(
            i for i, o in enumerate(outs) if bool(o.initialized)
        )
        est = np.stack([o.T_wc[:3, 3] for o in outs])
        seg = [
            i
            for i in range(init_frame, len(outs))
            if bool(outs[i].initialized) and not bool(outs[i].did_reset)
        ]
        # maintains tracking for most of the sequence
        assert len(seg) >= 12
        ate = ate_rmse(est[seg], scene.gt_positions[seg], align="sim3")
        assert np.isfinite(ate)
        assert ate < 3.0, f"KLT-mode ATE {ate:.2f}"
        # camera advances
        assert est[seg[-1], 2] > est[seg[0], 2] + 5
