#!/usr/bin/env python
"""Long-horizon drift ablation (VERDICT r3 item 1).

The committed long-sequence contract (tests/test_long_sequence.py:154)
failed under the judge's re-run: pre-blackout segment ATE ~7.1 m vs the
2.5x-cv2 bound of 6.59 m. This harness iterates on that exact segment
fast: it reuses the test's cached 256-frame fixture, caches the cv2
anchor's positions once, and runs the engine pre-blackout segment under
config overrides passed as KEY=VALUE args, reporting
  - sim3 ATE over frames [8, b0) (the test's contracted segment)
  - drift growth per 30-frame window (localizes WHERE it diverges)
  - keyframe/tracking stats
across multiple RANSAC seeds.

Usage: python scripts/ablate_long_drift.py [seeds=0,1,2,3] [KEY=VALUE...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # benign AOT-loader spam
_ON_TPU = "device=tpu" in sys.argv[1:]
if _ON_TPU:
    sys.argv.remove("device=tpu")
import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    "/root/repo/.jax_cache_bench" if _ON_TPU else "/root/repo/.jax_cache",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core import init_state
from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
from visualodometry_tpu.eval import ate_rmse

_FIX = "/root/repo/.test_fixture_long.npz"
_REF = "/root/repo/.test_fixture_long_ref.npz"
CHUNK = 8


def fixture():
    if not os.path.exists(_FIX):
        from visualodometry_tpu.data.synthetic import (
            make_long_corridor_fixture,
        )

        u8, gt, K, blank = make_long_corridor_fixture(
            num_frames=256, image_size=(640, 360)
        )
        np.savez_compressed(_FIX, u8=u8, gt=gt, K=K, blank=np.array(blank))
    d = np.load(_FIX, allow_pickle=True)
    return d["u8"], d["gt"], d["K"], tuple(int(x) for x in d["blank"])


def ref_positions(u8, K):
    if os.path.exists(_REF):
        return np.load(_REF)["pos"]
    from visualodometry_tpu.eval.reference_cv2 import run_reference_pipeline

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
    pos, _ = run_reference_pipeline(u8, np.asarray(K, np.float64), ref_cfg)
    np.savez_compressed(_REF, pos=pos)
    return pos


def test_cfg(**over):
    base = dict(
        extractor_type="sift",
        max_keypoints=2048,
        sift_n_features=2048,
        sift_contrast_threshold=0.012,
        sift_orientation_peaks=2,
        sift_num_octaves=3,
        min_median_flow=3.0,
        max_reproj_err=2.0,
        pnp_reproj_err=2.0,
        min_depth=1.0,
        min_parallax_deg=0.35,
        lowe_ratio=0.8,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=8192,
        matcher_backend="jnp",
        ba_window=5,
        ba_max_landmarks=1024,
    )
    base.update(over)
    return VOConfig(**base)


def run_engine(cfg, u8, K, n_frames, enable_ba=True):
    from visualodometry_tpu.ba.inloop import init_window

    run = make_chunked_pipeline_fn(cfg, K, enable_ba=enable_ba)
    if enable_ba:
        carry = (init_state(cfg, desc_dim=128), init_window(cfg))
    else:
        carry = init_state(cfg, desc_dim=128)
    outs = []
    for i in range(0, n_frames, CHUNK):
        carry, out = run(carry, jnp.asarray(u8[i : i + CHUNK]))
        outs.append(out)
    est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
    resets = np.concatenate([np.asarray(o.did_reset) for o in outs])
    kf = int(sum(np.asarray(o.is_keyframe).sum() for o in outs))
    ntr = np.concatenate([np.asarray(o.num_tracked) for o in outs])
    return est, resets, kf, ntr


def window_drift(est, gt, b0):
    """ATE of [8, t) for growing t — shows where divergence accumulates."""
    rows = []
    for t in range(38, b0 + 1, 30):
        rows.append((t, float(ate_rmse(est[8:t], gt[8:t], align="sim3"))))
    rows.append((b0, float(ate_rmse(est[8:b0], gt[8:b0], align="sim3"))))
    return rows


def main():
    over = {}
    seeds = [0, 1, 2, 3]
    enable_ba = True
    dump = None
    for a in sys.argv[1:]:
        k, v = a.split("=", 1)
        if k == "seeds":
            seeds = [int(x) for x in v.split(",")]
            continue
        if k == "ba":
            enable_ba = v not in ("0", "false")
            continue
        if k == "dump":
            dump = v
            continue
        f = VOConfig.__dataclass_fields__[k]
        typ = (
            f.type
            if callable(f.type) and not isinstance(f.type, str)
            else type(f.default)
        )
        over[k] = typ(v) if typ is not bool else v in ("1", "true", "True")
    u8, gt, K, (b0, b1) = fixture()
    ref = ref_positions(u8, K)
    ref_pre = float(ate_rmse(ref[8:b0], gt[8:b0], align="sim3"))
    print(f"fixture: {u8.shape} blackout=({b0},{b1}) cv2 pre-ATE={ref_pre:.3f}")
    print(f"bound (2.5x): {2.5 * ref_pre:.3f}   target (1.5x): {1.5 * ref_pre:.3f}")
    print("cv2 drift growth:", [f"{t}:{a:.2f}" for t, a in window_drift(ref, gt, b0)])

    for s in seeds:
        cfg = test_cfg(seed=s, **over)
        est, resets, kf, ntr = run_engine(cfg, u8, K, b0, enable_ba=enable_ba)
        if dump:
            np.savez(dump + f"_s{s}.npz", est=est, gt=gt[:b0], ntr=ntr)
        pre = float(ate_rmse(est[8:b0], gt[8:b0], align="sim3"))
        rf = np.nonzero(resets)[0].tolist()
        wd = [f"{t}:{a:.2f}" for t, a in window_drift(est, gt, b0)]
        print(
            f"seed {s}: pre-ATE {pre:.3f} ({pre / ref_pre:.2f}x cv2) "
            f"resets@{rf} kf={kf} tracked_med={int(np.median(ntr[8:]))}"
        )
        print("   drift growth:", wd)


if __name__ == "__main__":
    main()
