#!/usr/bin/env python
"""Engine-level ablation: the chunked engine (core/step.py + runner) on
the bench fixture, on the CPU backend — isolates engine *structure*
(fixed-slot step, ring map, scan) from on-chip numerics.

Run with PLATFORM=tpu to measure the same engine on the chip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

platform = os.environ.get("PLATFORM", "cpu")
if platform == "cpu":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from visualodometry_tpu.core import init_state
from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
from visualodometry_tpu.eval import ate_rmse

sys.path.insert(0, "/root/repo")
from bench import CHUNK, _build_cfg, _load_fixture, _reference_cfg


def run_engine(u8, gt, K, cfg, label):
    run = make_chunked_pipeline_fn(cfg, K)
    state = init_state(cfg, desc_dim=128)
    outs = []
    for i in range(0, len(u8), CHUNK):
        state, out = run(state, jnp.asarray(u8[i : i + CHUNK]))
        outs.append(out)
    est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
    resets = int(sum(np.asarray(o.did_reset).sum() for o in outs))
    kf = int(sum(np.asarray(o.is_keyframe).sum() for o in outs))
    ate = float(ate_rmse(est[8:], gt[8 : len(est)], align="sim3"))
    ninl = np.concatenate([np.asarray(o.num_tracked) for o in outs])
    nmatch = np.concatenate([np.asarray(o.num_matches) for o in outs])
    print(
        f"{label}: ATE {ate:.4f} resets {resets} kf {kf} "
        f"medtracked {np.median(ninl[2:]):.0f} medmatches {np.median(nmatch[2:]):.0f}",
        flush=True,
    )
    return ate


def main():
    u8, gt, K = _load_fixture()
    cfg = _build_cfg()
    if platform == "cpu":
        cfg = cfg.replace(matcher_backend="jnp")  # no Pallas on CPU
    ref_cfg = _reference_cfg()
    run_engine(u8, gt, K, cfg, f"engine[{platform}] bench cfg")
    run_engine(
        u8, gt, K,
        cfg.replace(lowe_ratio=0.75, min_parallax_deg=0.0),
        f"engine[{platform}] ref gates",
    )
    run_engine(
        u8, gt, K,
        cfg.replace(global_scale=ref_cfg.global_scale),
        f"engine[{platform}] bench cfg, global_scale=1.2",
    )


if __name__ == "__main__":
    main()
