"""Checkpoint/resume: a restored state continues bit-identically."""

import numpy as np
import jax

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state, make_step_fn
from visualodometry_tpu.core.checkpoint import load_state, save_state
from visualodometry_tpu.data.synthetic import make_scene, render_features
from visualodometry_tpu.utils.profiling import StageTimer

N_SLOTS = 256


def test_save_load_resume(tmp_path):
    cfg = VOConfig(
        extractor_type="synthetic",
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        min_median_flow=3.0,
        essential_hypotheses=64,
        pnp_hypotheses=64,
        map_capacity=1024,
    )
    rng = np.random.default_rng(3)
    scene = make_scene(rng, num_frames=10, speed=1.2, num_landmarks=1500)
    feats = [
        render_features(scene, f, N_SLOTS, rng, pixel_noise=0.2)
        for f in range(10)
    ]
    step = jax.jit(make_step_fn(cfg, scene.K))

    state = init_state(cfg, desc_dim=128)
    for f in feats[:5]:
        state, _ = step(state, f)

    ckpt = tmp_path / "vo_state.npz"
    save_state(state, ckpt)
    restored = load_state(ckpt, init_state(cfg, desc_dim=128))

    outs_a, outs_b = [], []
    sa, sb = state, restored
    for f in feats[5:]:
        sa, oa = step(sa, f)
        sb, ob = step(sb, f)
        outs_a.append(oa)
        outs_b.append(ob)
    for oa, ob in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(oa.T_wc), np.asarray(ob.T_wc))
        np.testing.assert_array_equal(
            np.asarray(oa.curr_ids), np.asarray(ob.curr_ids)
        )


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["mean_ms"] >= 0
