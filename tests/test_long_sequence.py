"""Long-sequence robustness: 256 frames, real turns, reset-and-recover.

The reference runs thousands-frame KITTI sequences (src/main.py:58-64);
every prior e2e artifact here was <= 48 frames. This drives the chunked
engine over a 256-frame textured corridor with two S-curves and a
3-frame blackout that forces the failure path (reset, vo.py:290-299)
followed by re-bootstrap + re-initialization, and asserts:
  - exactly the one expected reset episode (no unexplained resets);
  - tracking re-initializes after the blackout;
  - per-segment sim3 ATE stays bounded on both sides of the reset
    (after a reset both engines restart the trajectory at the origin,
    so segment-wise ATE is the honest health metric — see
    data/synthetic.py:segment_ate);
  - the landmark ring buffer wraps (map pruning under pressure).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state
from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
from visualodometry_tpu.data.synthetic import (
    make_long_corridor_fixture,
    segment_ate,
)

_CACHE = "/root/repo/.test_fixture_long.npz"
N_FRAMES = 256
CHUNK = 8


def _fixture():
    if os.path.exists(_CACHE):
        d = np.load(_CACHE, allow_pickle=True)
        return d["u8"], d["gt"], d["K"], tuple(d["blank"])
    u8, gt, K, blank = make_long_corridor_fixture(
        num_frames=N_FRAMES, image_size=(640, 360)
    )
    np.savez_compressed(_CACHE, u8=u8, gt=gt, K=K, blank=np.array(blank))
    return u8, gt, K, blank


def _cfg():
    return VOConfig(
        extractor_type="sift",
        max_keypoints=2048,
        sift_n_features=2048,
        sift_contrast_threshold=0.02,
        sift_num_octaves=3,
        min_median_flow=3.0,
        max_reproj_err=2.0,
        pnp_reproj_err=2.0,
        min_depth=1.0,
        min_parallax_deg=0.35,
        lowe_ratio=0.8,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=8192,  # small enough that 200+ keyframes wrap it
        matcher_backend="jnp",
    )


@pytest.mark.slow
class TestLongSequence:
    def test_reset_recover_and_segment_ate(self):
        u8, gt, K, blank = _fixture()
        cfg = _cfg()
        run = make_chunked_pipeline_fn(cfg, K)
        state = init_state(cfg, desc_dim=128)
        outs = []
        for i in range(0, N_FRAMES, CHUNK):
            state, out = run(state, jnp.asarray(u8[i : i + CHUNK]))
            outs.append(out)
        est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
        resets = np.concatenate([np.asarray(o.did_reset) for o in outs])
        inited = np.concatenate([np.asarray(o.initialized) for o in outs])
        kf = int(sum(np.asarray(o.is_keyframe).sum() for o in outs))

        assert np.isfinite(est).all()

        # the blackout (and only the blackout) causes resets: the first
        # reset lands inside/just after the blank window, and no reset
        # fires more than a few frames past it
        b0, b1 = blank
        reset_frames = np.nonzero(resets)[0]
        assert len(reset_frames) >= 1, "blackout did not trigger a reset"
        assert reset_frames[0] >= b0, reset_frames
        assert reset_frames[-1] <= b1 + 4, (
            f"unexplained reset at frames {reset_frames}"
        )

        # tracking recovers: initialized again well before the end and
        # keyframes keep firing afterwards
        assert bool(inited[-1]), "never re-initialized after the blackout"
        recover = np.nonzero(inited[b1:])[0]
        assert len(recover) and recover[0] < 24, "slow re-initialization"
        assert kf > 30

        # per-segment accuracy: both the pre-blackout and post-recovery
        # segments track at sub-decimeter-class sim3 ATE per ~150 frames
        segs = segment_ate(est, gt, resets)
        assert len(segs) >= 2, segs
        for s, e, ate in segs:
            assert ate < 0.6, f"segment {s}:{e} ATE {ate:.3f}"

        # map pruning under pressure: the ring buffer wrapped
        assert int(state.map.next_id) > cfg.map_capacity, int(
            state.map.next_id
        )
