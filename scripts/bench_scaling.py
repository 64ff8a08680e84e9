#!/usr/bin/env python
"""Scaling-efficiency harness: multi-sequence throughput vs device count.

BASELINE.md north-star row 4: >= 80% scaling efficiency from 1 host to
N >= 2 hosts (concurrent sequences, sharded map blocks, distributed
Schur BA). Real multi-chip hardware isn't attached in this environment,
so the harness measures on whatever devices exist:

  - default: the virtual 8-CPU mesh (shape-and-collective validation —
    CPU timings do NOT predict TPU efficiency, but the harness, the
    sharding layouts, and the efficiency math are exactly what runs on a
    pod);
  - `--tpu` on a multi-chip host: the real measurement.

Method: fix the per-device work (2 sequences per device — weak scaling,
the deployment regime: more hosts <=> more concurrent sequences), time
the jitted multi-sequence step at n_devices in {1, 2, 4, ...,  N}, and
report efficiency(n) = throughput(n) / (n * throughput(1)).

Usage: python scripts/bench_scaling.py [--tpu] [--frames 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="use the attached TPU devices")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--slots", type=int, default=256)
    ap.add_argument("--seq-per-device", type=int, default=2)
    args = ap.parse_args()

    if not args.tpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.data.synthetic import make_scene, render_features
    from visualodometry_tpu.parallel import make_mesh
    from visualodometry_tpu.parallel.multiseq import (
        init_batched_state,
        make_multiseq_step_fn,
        shard_batched,
    )

    n_slots = args.slots
    cfg = VOConfig(
        extractor_type="synthetic",
        max_keypoints=n_slots,
        sift_n_features=n_slots,
        min_median_flow=3.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=128,
        pnp_hypotheses=128,
        map_capacity=2048,
        essential_solver="8point",
    )

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    K = None
    results = {}
    for n in sizes:
        mesh = make_mesh(num_seq=n, num_map=1, devices=devices[:n])
        B = n * args.seq_per_device  # weak scaling: fixed work per device
        rngs = [np.random.default_rng(100 + b) for b in range(B)]
        scenes = [
            make_scene(r, num_frames=args.frames, speed=1.2, num_landmarks=1500)
            for r in rngs
        ]
        K = jnp.asarray(scenes[0].K)
        feats = [
            jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[
                    render_features(s, f, n_slots, r, pixel_noise=0.2)
                    for s, r in zip(scenes, rngs)
                ],
            )
            for f in range(args.frames)
        ]
        mstep = make_multiseq_step_fn(cfg, K, mesh)
        state = shard_batched(init_batched_state(cfg, 128, B), mesh)
        feats = [shard_batched(f, mesh) for f in feats]

        state, out = mstep(state, feats[0])  # compile + warm
        jax.block_until_ready(out.T_wc)
        t0 = time.perf_counter()
        for f in range(1, args.frames):
            state, out = mstep(state, feats[f])
        jax.block_until_ready(out.T_wc)
        dt = time.perf_counter() - t0
        fps = B * (args.frames - 1) / dt
        results[n] = fps
        eff = fps / (n * results[1]) if n > 1 else 1.0
        print(
            json.dumps(
                {
                    "devices": n,
                    "sequences": B,
                    "seq_frames_per_s": round(fps, 2),
                    "scaling_efficiency": round(eff, 3),
                    "platform": devices[0].platform,
                }
            )
        )


if __name__ == "__main__":
    main()
