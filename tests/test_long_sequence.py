"""Long-sequence robustness: 256 frames, real turns, reset-and-recover.

The reference runs thousands-frame KITTI sequences (src/main.py:58-64);
every prior e2e artifact here was <= 48 frames. This drives the chunked
engine over a 256-frame textured corridor with two S-curves and a
3-frame blackout that forces the failure path (reset, vo.py:290-299).
The blackout lands right before the second S-curve's peak yaw rate —
deliberately the hardest spot: the engine must re-bootstrap a fresh map
WHILE turning through the fixture's most feature-poor stretch.

The reference loop itself is run on the same frames inside the test as
the honest bar. Measured behavior (see also PROGRESS notes): the cv2
loop "recovers" with a single reset but its post-blackout trajectory is
garbage (segment ATE ~33 m) — it silently tracks a wrecked map. This
engine retries (a few reset/re-init rounds through the peak turn), then
locks on and tracks the final ~70 frames at ~0.1 m. Assertions encode
that contract:
  - the blackout (and nothing before it) causes the first reset;
  - any further resets are confined to the blackout + turn-recovery
    window — the stable stretches never reset;
  - the pre-blackout segment stays within 2.5x the cv2 loop's ATE on
    the identical segment;
  - the final segment re-tracks at sub-metre ATE (the reference's
    post-blackout behavior is ~33 m);
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
        return d["u8"], d["gt"], d["K"], tuple(int(x) for x in d["blank"])
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
        # cv2-matched detection + matching gates (r4): the r3 "recall"
        # gates (contrast 0.012 / Lowe 0.8) fed the turns with low-
        # contrast keypoints and loose matches — measured +1.9 m of
        # pre-blackout drift vs these values on identical seeds
        # (scripts/ablate_long_drift.py; full sweep in RESULTS r4).
        # Peak splitting stays: single-orientation keypoints measured
        # worse through the S-curves (6.1 vs 4.3).
        sift_contrast_threshold=0.02,
        sift_orientation_peaks=2,
        sift_num_octaves=3,
        min_median_flow=3.0,
        max_reproj_err=2.0,
        pnp_reproj_err=2.0,
        min_depth=1.0,
        min_parallax_deg=0.35,
        lowe_ratio=0.75,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        # P3P minimal-solver hypotheses (r5, the production KITTI
        # default): exact on the minimal set where the 6-point DLT's
        # least-squares fit amplifies pixel noise. Measured on this
        # fixture, 6 seeds, CPU contract platform: pre-blackout drift
        # median 1.46x cv2 (dlt: 1.87x), max 1.83x (dlt: 2.59x) —
        # scripts/ablate_long_drift.py, RESULTS r5.
        pnp_solver="p3p",
        map_capacity=8192,  # small enough that 200+ keyframes wrap it
        matcher_backend="jnp",
        ba_window=5,
        ba_max_landmarks=1024,
    )


@pytest.mark.slow
class TestLongSequence:
    def test_reset_recover_and_segment_ate(self):
        u8, gt, K, blank = _fixture()
        b0, b1 = blank
        cfg = _cfg()
        # structure-only in-loop BA: the engine's long-run configuration
        # (measured: halves the drift the refined landmarks feed back)
        from visualodometry_tpu.ba.inloop import init_window

        run = make_chunked_pipeline_fn(cfg, K, enable_ba=True)
        carry = (init_state(cfg, desc_dim=128), init_window(cfg))
        outs = []
        for i in range(0, N_FRAMES, CHUNK):
            carry, out = run(carry, jnp.asarray(u8[i : i + CHUNK]))
            outs.append(out)
        state = carry[0]
        est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
        resets = np.concatenate([np.asarray(o.did_reset) for o in outs])
        inited = np.concatenate([np.asarray(o.initialized) for o in outs])
        kf = int(sum(np.asarray(o.is_keyframe).sum() for o in outs))

        assert np.isfinite(est).all()

        # the blackout causes the first reset; later resets only inside
        # the blackout + turn-recovery window (the stable stretches
        # before the blackout and after lock-on never reset)
        reset_frames = np.nonzero(resets)[0]
        assert len(reset_frames) >= 1, "blackout did not trigger a reset"
        assert b0 <= reset_frames[0] <= b1, reset_frames
        # the recovery window spans the feature-poor second-curve apex:
        # re-init retries there are the failure detector working (how
        # many rounds it takes is a RANSAC draw; r4 observed up to 48
        # frames after the blackout ends)
        assert reset_frames[-1] <= b1 + 60, (
            f"reset outside the recovery window: {reset_frames}"
        )

        # re-initializes and keeps tracking to the end
        assert bool(inited[-1]), "never re-initialized after the blackout"
        assert kf > 30

        segs = segment_ate(est, gt, resets)
        assert len(segs) >= 2, segs
        seg_pre = next(s for s in segs if s[0] == 0)
        seg_final = segs[-1]
        assert seg_final[1] == N_FRAMES and seg_final[1] - seg_final[0] >= 48

        # the honest bar: the reference's own loop on identical frames
        from visualodometry_tpu.eval.reference_cv2 import (
            run_reference_pipeline,
        )

        ref_cfg = VOConfig(
            extractor_type="sift",
            max_keypoints=2048,
            sift_n_features=2048,
            sift_contrast_threshold=0.02,
            min_median_flow=3.0,
            max_reproj_err=2.0,
            pnp_reproj_err=2.0,
            min_depth=1.0,
            lowe_ratio=0.75,
            global_scale=1.2,
        )
        ref_pos, ref_stats = run_reference_pipeline(
            u8, np.asarray(K, np.float64), ref_cfg
        )
        from visualodometry_tpu.eval import ate_rmse

        ref_pre = float(ate_rmse(ref_pos[8:b0], gt[8:b0], align="sim3"))
        assert seg_pre[2] <= max(2.5 * ref_pre, 1.0), (seg_pre, ref_pre)

        # post-recovery lock-on: clean tracking (the cv2 loop's
        # post-blackout segment measures ~33 m ATE on these frames —
        # it never detects that its re-initialized map is wrecked)
        assert seg_final[2] < 1.0, seg_final

        # map pruning under pressure: the ring buffer wrapped
        assert int(state.map.next_id) > cfg.map_capacity, int(
            state.map.next_id
        )

    def test_multi_seed_drift_distribution(self):
        """Pre-blackout drift across RANSAC seeds: a DISTRIBUTION contract.

        The per-seed 150-frame drift is effectively a draw from a wide
        distribution (r4 measured 22 draws across configs: mean ~2.1x
        the cv2 anchor, ~25% mass above 2.5x — RESULTS r4): any single-
        seed threshold at 2.5x fails one run in four no matter the
        config, which is exactly how the r3 contract broke under
        re-measurement. The robust contract bounds the MEDIAN (typical
        behavior) and the MAX (tail) over three seeds.
        """
        u8, gt, K, blank = _fixture()
        b0, _ = blank
        from visualodometry_tpu.ba.inloop import init_window
        from visualodometry_tpu.eval import ate_rmse
        from visualodometry_tpu.eval.reference_cv2 import (
            run_reference_pipeline,
        )

        ref_cfg = VOConfig(
            extractor_type="sift",
            max_keypoints=2048,
            sift_n_features=2048,
            sift_contrast_threshold=0.02,
            min_median_flow=3.0,
            max_reproj_err=2.0,
            pnp_reproj_err=2.0,
            min_depth=1.0,
            lowe_ratio=0.75,
            global_scale=1.2,
        )
        ref_pos, _ = run_reference_pipeline(
            u8[:b0], np.asarray(K, np.float64), ref_cfg
        )

        n = (b0 // CHUNK) * CHUNK  # whole chunks strictly before blackout
        ates = []
        for s in (0, 1, 2):
            cfg = _cfg().replace(seed=s)
            run = make_chunked_pipeline_fn(cfg, K, enable_ba=True)
            carry = (init_state(cfg, desc_dim=128), init_window(cfg))
            outs = []
            for i in range(0, n, CHUNK):
                carry, out = run(carry, jnp.asarray(u8[i : i + CHUNK]))
                outs.append(out)
            est = np.concatenate(
                [np.asarray(o.T_wc)[:, :3, 3] for o in outs]
            )
            resets = np.concatenate(
                [np.asarray(o.did_reset) for o in outs]
            )
            assert int(resets.sum()) == 0, (s, np.nonzero(resets)[0])
            ates.append(
                float(ate_rmse(est[8:n], gt[8:n], align="sim3"))
            )
        ref_pre = float(ate_rmse(ref_pos[8:n], gt[8:n], align="sim3"))
        med = float(np.median(ates))
        mx = float(np.max(ates))
        # r5 contract, tightened after the P3P hypothesis switch: the
        # 6-seed distribution measured median 1.46x / max 1.83x on this
        # platform (r4 dlt: median 1.87x observed here, 2.3x on chip).
        # Bounds leave platform/seed headroom over those measurements.
        assert med <= 2.0 * ref_pre, (ates, ref_pre)
        assert mx <= 3.0 * ref_pre, (ates, ref_pre)
