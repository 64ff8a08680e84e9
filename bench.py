#!/usr/bin/env python
"""Benchmark: VO step throughput on the real chip vs the CPU reference path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measures the steady-state per-frame cost of the jit-compiled VO core
(descriptor matching + branch machinery + batched RANSAC PnP/essential +
landmark map update) on a KITTI-like synthetic sequence at the reference's
operating shapes (2048 keypoints, 128-D descriptors, 20k landmark map).

The baseline anchor re-implements the reference's per-frame hot path with
the same libraries the reference uses (OpenCV BFMatcher kNN + Lowe ratio
loop + solvePnPRansac; reference: src/modules/frontend.py:100-111,
src/modules/vo.py:135-141) on this host's CPU, over the same synthetic
data. Feature *extraction* is excluded from BOTH sides for now (the
Pallas/XLA extractor lands in a later milestone; the reference's SIFT
detect would only widen the gap in our favor).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _build_sequence(n_frames: int, n_slots: int, seed: int = 0):
    from visualodometry_tpu.data.synthetic import make_scene, render_features

    rng = np.random.default_rng(seed)
    scene = make_scene(
        rng, num_frames=n_frames, speed=1.2, turn_rate=0.003, num_landmarks=2500
    )
    feats = [
        render_features(scene, f, n_slots, rng, pixel_noise=0.2)
        for f in range(n_frames)
    ]
    return scene, feats


def bench_tpu_step(scene, feats, cfg, warmup: int = 10) -> float:
    """Steady-state frames/sec of the jitted step on the default device."""
    import jax

    from visualodometry_tpu.core import init_state, make_step_fn

    step = jax.jit(make_step_fn(cfg, scene.K), donate_argnums=(0,))
    state = init_state(cfg, desc_dim=128)

    device = jax.devices()[0]
    feats_dev = [jax.device_put(f, device) for f in feats]

    for f in feats_dev[:warmup]:
        state, out = step(state, f)
    jax.block_until_ready(out.T_wc)

    t0 = time.perf_counter()
    for f in feats_dev[warmup:]:
        state, out = step(state, f)
    jax.block_until_ready(out.T_wc)
    dt = time.perf_counter() - t0
    return (len(feats_dev) - warmup) / dt


def bench_reference_cpu(scene, feats, cfg, n_frames: int = 12) -> float:
    """Frames/sec of the reference's hot path (OpenCV, host CPU)."""
    import cv2

    K = scene.K.astype(np.float64)
    matcher = cv2.BFMatcher(cv2.NORM_L2, crossCheck=False)

    descs = [np.asarray(f.desc) for f in feats[: n_frames + 1]]
    kpss = [np.asarray(f.kps) for f in feats[: n_frames + 1]]

    # plausible 3D points for the PnP stage (depths like the scene's)
    rng = np.random.default_rng(1)

    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        # kNN k=2 + Lowe ratio python loop (reference frontend.py:100-111)
        knn = matcher.knnMatch(descs[i - 1], descs[i], k=2)
        good = []
        for m_n in knn:
            if len(m_n) == 2:
                m, n = m_n
                if m.distance < 0.75 * n.distance:
                    good.append([m.queryIdx, m.trainIdx])
        good = np.asarray(good, int)
        take = min(len(good), 500)
        if take >= 6:
            idx = good[:take]
            pts3d = np.concatenate(
                [
                    kpss[i - 1][idx[:, 0]] * 0.02,
                    rng.uniform(8, 50, (take, 1)),
                ],
                axis=1,
            )
            pts2d = kpss[i][idx[:, 1]].astype(np.float64)
            cv2.solvePnPRansac(
                pts3d.astype(np.float64), pts2d, K, None, reprojectionError=1.0
            )
    dt = time.perf_counter() - t0
    return n_frames / dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from visualodometry_tpu.config import get_config

    n_slots = 2048
    cfg = get_config("kitti").replace(
        max_keypoints=n_slots,
        sift_n_features=n_slots,
        min_median_flow=3.0,
        pnp_reproj_err=2.0,
    )

    n_frames = 70
    scene, feats = _build_sequence(n_frames, n_slots)

    fps_tpu = bench_tpu_step(scene, feats, cfg)
    fps_ref = bench_reference_cpu(scene, feats, cfg)

    print(
        json.dumps(
            {
                "metric": "kitti_equiv_vo_step_fps_per_chip",
                "value": round(fps_tpu, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_tpu / fps_ref, 2),
                "baseline_fps_cpu_reference_path": round(fps_ref, 2),
                "note": (
                    "VO core step (match+RANSAC+map) at 2048 kps/128-D on "
                    "one chip vs reference OpenCV match+PnP path on host "
                    "CPU; feature extraction excluded on both sides"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
