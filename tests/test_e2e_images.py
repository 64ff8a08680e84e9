"""End-to-end smoke test: rendered images -> SIFT frontend -> VO core.

The complete minimum slice of SURVEY.md §7 step 5: images in, trajectory
out, no hand-fed features anywhere. Bounds are smoke-level (the synthetic
dot-world is harder than real texture for SIFT); the feature-level and
step-level tests carry the tight accuracy contracts.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state, make_step_fn
from visualodometry_tpu.data.synthetic import make_scene, render_image
from visualodometry_tpu.eval import ate_rmse
from visualodometry_tpu.frontend.sift import extract_sift


def _make_cfg(N=1024):
    return VOConfig(
        extractor_type="sift",
        max_keypoints=N,
        sift_n_features=N,
        sift_contrast_threshold=0.015,
        sift_edge_threshold=10.0,
        sift_num_octaves=3,
        min_median_flow=3.0,
        max_reproj_err=4.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=8192,
    )


@pytest.mark.slow
def test_images_to_trajectory():
    cfg = _make_cfg()
    # NOTE: this scenario (3 px median flows, scene depth >> keyframe
    # baseline) is intentionally hard and seed-sensitive: a couple of
    # scene seeds hit one tracking reset regardless of solver numerics
    # (r3 scan: 6/8 seeds track cleanly at ATE 0.04-0.07; seeds 2 and 4
    # reset once). Seed 0 tracks cleanly; the BA test below covers a
    # reset-prone seed.
    rng = np.random.default_rng(0)
    scene = make_scene(
        rng,
        num_frames=24,
        speed=1.2,
        turn_rate=0.002,
        num_landmarks=1600,
        image_size=(640, 360),
    )
    step = jax.jit(make_step_fn(cfg, scene.K))
    state = init_state(cfg, desc_dim=128)
    outs = []
    for f in range(scene.num_frames):
        img = render_image(scene, f, dot_sigma=2.0)
        feats = extract_sift(jnp.asarray(img), cfg)
        state, out = step(state, feats)
        outs.append(jax.tree.map(np.asarray, out))

    # extraction feeds enough keypoints and matching works
    init_frames = [i for i, o in enumerate(outs) if bool(o.initialized)]
    assert init_frames and init_frames[0] < 8
    # tracking holds through the tail without resets
    tail = outs[8:]
    assert all(not bool(o.did_reset) for o in tail)
    assert all(bool(o.initialized) for o in tail)
    assert np.median([int(o.num_matches) for o in tail]) > 60

    est = np.stack([o.T_wc[:3, 3] for o in outs])
    seg = [i for i in range(8, scene.num_frames)]
    ate = ate_rmse(est[seg], scene.gt_positions[seg], align="sim3")
    # the robust-IRLS estimators (r3) track this at ~0.05 m; the bound
    # keeps slack for platform jitter (~29 m path)
    assert ate < 0.3, f"ATE {ate:.2f} m"
    # and the camera really travels forward
    assert est[-1, 2] > est[8, 2] + 50


def test_images_to_trajectory_with_ba():
    """Same slice through the host engine with in-loop windowed BA.

    Seed 3 hits a mid-sequence tracking reset without BA (the map drifts
    internally inconsistent); the window refinement keeps it consistent —
    the BA layer demonstrably adds robustness, not just polish.
    """
    from visualodometry_tpu.core.pipeline import VOEngine

    cfg = _make_cfg().replace(ba_window=4, ba_max_landmarks=512, ba_iters=6)
    rng = np.random.default_rng(3)
    scene = make_scene(
        rng,
        num_frames=24,
        speed=1.2,
        turn_rate=0.002,
        num_landmarks=1600,
        image_size=(640, 360),
    )
    eng = VOEngine(K=scene.K, cfg=cfg, enable_ba=True)
    resets = 0
    for f in range(scene.num_frames):
        img = render_image(scene, f, dot_sigma=2.0)
        out = eng.process_frame(img)
        resets += int(out.did_reset)
    assert resets == 0
    est = eng.positions()
    assert est.shape[0] == scene.num_frames
    ate = ate_rmse(est[8:], scene.gt_positions[8:], align="sim3")
    assert ate < 1.0, f"ATE {ate:.2f} m"

    # pose-graph smoothing over the keyframe chain (config[3]): fuses the
    # chain with the BA-refined window edges; must stay consistent (no
    # blow-up) and not materially degrade the trajectory
    est_sm = eng.positions(smoothed=True)
    assert est_sm.shape == est.shape
    assert np.isfinite(est_sm).all()
    ate_sm = ate_rmse(est_sm[8:], scene.gt_positions[8:], align="sim3")
    assert ate_sm < max(1.0, ate * 1.5), f"smoothed ATE {ate_sm:.2f} m"
