#!/usr/bin/env python
"""Chip-vs-CPU bisect of the bench-fixture ATE gap (0.16 vs 0.009).

Phase 1 (PLATFORM=tpu, default): extract features for all 32 bench
frames on the CHIP, save to .npz.
Phase 2 (PLATFORM=cpu): run the step scan on CPU twice — once over the
chip-extracted features, once over CPU-extracted features — and report
both ATEs. Whichever hybrid reproduces the chip's 0.16 identifies the
divergent stage (extraction vs step).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

platform = os.environ.get("PLATFORM", "tpu")
if platform == "cpu":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from bench import _build_cfg, _load_fixture
from visualodometry_tpu.frontend.sift import extract_sift

OUT = "/root/repo/.chip_feats.npz"


def extract_all(u8, cfg, tag):
    import functools

    fn = jax.jit(functools.partial(extract_sift, cfg=cfg))
    ks, ds, vs = [], [], []
    for img in u8:
        f = fn(jnp.asarray(img))
        ks.append(np.asarray(f.kps))
        ds.append(np.asarray(f.desc))
        vs.append(np.asarray(f.valid))
    print(f"[{tag}] median valid/frame:",
          np.median([v.sum() for v in vs]), flush=True)
    return np.stack(ks), np.stack(ds), np.stack(vs)


def run_step_cpu(u8, gt, K, cfg, kps, desc, valid, tag):
    from visualodometry_tpu.core import init_state
    from visualodometry_tpu.core.runner import make_chunked_step_fn
    from visualodometry_tpu.eval import ate_rmse
    from visualodometry_tpu.frontend.interface import Features

    CHUNK = 8
    run = make_chunked_step_fn(cfg, K)
    state = init_state(cfg, desc_dim=128)
    outs = []
    for i in range(0, len(u8), CHUNK):
        fs = Features(
            kps=jnp.asarray(kps[i : i + CHUNK]),
            desc=jnp.asarray(desc[i : i + CHUNK]),
            valid=jnp.asarray(valid[i : i + CHUNK]),
        )
        state, out = run(state, fs)
        outs.append(out)
    est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
    resets = int(sum(np.asarray(o.did_reset).sum() for o in outs))
    ate = float(ate_rmse(est[8:], gt[8:], align="sim3"))
    print(f"[{tag}] ATE {ate:.4f} resets {resets}", flush=True)


def main():
    u8, gt, K = _load_fixture()
    cfg = _build_cfg()
    if platform == "tpu":
        kps, desc, valid = extract_all(u8, cfg, "chip-extract")
        np.savez_compressed(OUT, kps=kps, desc=desc, valid=valid)
        return
    cfg = cfg.replace(matcher_backend="jnp")
    d = np.load(OUT)
    run_step_cpu(u8, gt, K, cfg, d["kps"], d["desc"], d["valid"],
                 "chip feats + cpu step")
    kps, desc, valid = extract_all(u8, cfg, "cpu-extract")
    dk = np.abs(kps - d["kps"]).max()
    dd = np.abs(desc - d["desc"]).max()
    dv = (valid != d["valid"]).sum()
    print(f"feat diff: |kps| {dk:.4g} |desc| {dd:.4g} valid flips {dv}",
          flush=True)
    run_step_cpu(u8, gt, K, cfg, kps, desc, valid, "cpu feats + cpu step")


if __name__ == "__main__":
    main()
