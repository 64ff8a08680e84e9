#!/usr/bin/env python
"""kitti-gates reset ablation: DLT vs P3P PnP hypotheses (VERDICT r4 #1).

Runs the bench's kitti_gates stage configuration — the reference's
ACTUAL KITTI tuning (min_median_flow=40, pnp_reproj_err=1, reference:
src/config/config.py:53-70) on the marathon fixture's first 256 frames
— once per PnP solver, and reports resets / keyframes / tracking /
segment ATE for each.  The r4 diagnosis (RESULTS.md) blamed the 3
non-blackout resets on 6-point-DLT hypothesis noise at the 1-px gate on
fast-flow keyframe-boundary frames; P3P hypotheses are algebraically
exact on their minimal set, so this ablation is the direct test.

Usage: python scripts/ablate_kittigates.py [--frames 256] [--solvers dlt,p3p]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from bench import CHUNK, _load_fixture_long
from visualodometry_tpu.config import get_config
from visualodometry_tpu.core import init_state
from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
from visualodometry_tpu.data.synthetic import segment_ate


def run_stage(cfg, u8, gt, n):
    run = make_chunked_pipeline_fn(cfg, K)
    state = init_state(cfg, desc_dim=128)
    chunks = [jnp.asarray(u8[i : i + CHUNK]) for i in range(0, n, CHUNK)]
    float(jnp.sum(chunks[-1][:, ::37, ::37]))
    outs = []
    t0 = time.perf_counter()
    for c in chunks:
        state, out = run(state, c)
        outs.append(out)
    float(jnp.sum(out.T_wc))
    dt = time.perf_counter() - t0
    est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
    resets = np.concatenate([np.asarray(o.did_reset) for o in outs])
    kf = int(sum(np.asarray(o.is_keyframe).sum() for o in outs))
    inited = np.concatenate([np.asarray(o.initialized) for o in outs])
    segs = segment_ate(est, gt, resets)
    reset_frames = np.nonzero(resets)[0].tolist()
    return {
        "resets": int(resets.sum()),
        "reset_frames": reset_frames,
        "keyframes": kf,
        "tracking": bool(inited[-1]),
        "segment_ate_max": max((a for _, _, a in segs), default=None),
        "fps_with_compile": n / dt,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--solvers", default="dlt,p3p")
    ap.add_argument("--set", action="append", default=[],
                    help="extra cfg overrides key=value")
    args = ap.parse_args()

    u8, gt, K, blanks = _load_fixture_long()
    n = args.frames
    u8, gt = u8[:n], gt[:n]

    base = get_config("kitti", extractor="sift").replace(
        matcher_backend="pallas",
        sift_edge_threshold=10.0,
        global_scale=2.4,
    )
    for ov in args.set:
        k, v = ov.split("=")
        cur = getattr(base, k)
        base = base.replace(**{k: type(cur)(v) if cur is not None else v})

    for solver in args.solvers.split(","):
        cfg = base.replace(pnp_solver=solver)
        res = run_stage(cfg, u8, gt, n)
        print(json.dumps({"solver": solver, **res}), flush=True)
