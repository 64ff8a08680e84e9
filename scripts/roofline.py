#!/usr/bin/env python
"""Roofline accounting for the hot stages (VERDICT r1 item 5).

For each stage: XLA's own cost analysis (FLOPs + HBM bytes accessed of
the compiled executable) + measured wall time on the chip, against
v5e speed-of-light (197 TFLOP/s bf16 / 49 TFLOP/s fp32 MXU, 819 GB/s
HBM). Prints a table of ms, flops, bytes, the compute/bandwidth lower
bounds, and the fraction of speed-of-light achieved — i.e. "is this
stage actually fast, and which wall is it near".

Run on the chip: python scripts/roofline.py [--json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 49e12  # v5e MXU fp32 (bf16 inputs w/ f32 accum hit 197)
HBM_BW = 819e9


def _timed(fn, args, sync, reps=10):
    out = fn(*args)
    sync(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def _cost(fn, args):
    c = fn.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.core import init_state, make_step_fn
    from visualodometry_tpu.data.synthetic import make_scene, render_features

    rows = []

    def add(name, fn, args, sync, per=1):
        ms = _timed(fn, args, sync) * 1e3 / per
        fl, by = _cost(fn, args)
        fl, by = fl / per, by / per
        lb_c = fl / PEAK_BF16 * 1e3
        lb_c32 = fl / PEAK_F32 * 1e3
        lb_b = by / HBM_BW * 1e3
        sol = max(lb_c, lb_b)
        rows.append(
            {
                "stage": name,
                "ms": round(ms, 3),
                "gflops": round(fl / 1e9, 2),
                "mbytes": round(by / 1e6, 1),
                "lb_compute_bf16_ms": round(lb_c, 3),
                "lb_compute_f32_ms": round(lb_c32, 3),
                "lb_bandwidth_ms": round(lb_b, 3),
                "pct_speed_of_light": round(100 * sol / ms, 1),
                "bound": "compute" if lb_c > lb_b else "bandwidth",
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # --- SIFT extraction, KITTI operating point (8-frame chunk) ---
    N = 4096
    cfg = VOConfig(
        extractor_type="sift", max_keypoints=N, sift_n_features=N,
        sift_contrast_threshold=0.02, sift_num_octaves=3,
        min_median_flow=3.0, max_reproj_err=2.0, pnp_reproj_err=2.0,
        min_depth=1.0, min_parallax_deg=0.35, lowe_ratio=0.8,
        essential_hypotheses=256, pnp_hypotheses=256, map_capacity=20480,
    )
    from visualodometry_tpu.frontend.sift import extract_sift

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        (rng.random((8, 370, 1226)) * 255).astype(np.uint8)
    )
    vex = jax.jit(lambda b: jax.lax.map(lambda im: extract_sift(im, cfg), b))
    add("sift_extract_per_frame", vex, (imgs,),
        lambda o: float(jnp.sum(o.kps)), per=8)

    # --- kNN matcher 4096x4096x128 (jnp path; the Pallas kernel's cost
    # model is the same matmul) ---
    from visualodometry_tpu.frontend.matcher import match_descriptors

    d0 = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    d1 = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    v = jnp.ones((N,), bool)
    mfn = jax.jit(
        lambda a, b: match_descriptors(a, v, b, v, ratio=0.8)
    )
    add("matcher_4096x4096x128", mfn, (d0, d1),
        lambda o: float(jnp.sum(o.idx)))

    # --- VO step (in-scan body cost: single step here) ---
    scene = make_scene(rng, num_frames=4, speed=1.2, num_landmarks=8000,
                      image_size=(1226, 370))
    feats = render_features(scene, 1, cfg.padded_keypoints, rng)
    state = init_state(cfg, desc_dim=128)
    step = jax.jit(make_step_fn(cfg, scene.K))
    add("vo_step", step, (state, feats),
        lambda o: float(jnp.sum(o[1].T_wc)))

    # --- BA solve 20 kf x 5120 lm x 8 iters ---
    from bench import bench_ba_solve_ms  # reuse problem construction
    from visualodometry_tpu.ba import BAProblem, ba_solve

    P, L = 20, 5120
    K = jnp.asarray(
        [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]],
        jnp.float32,
    )
    X = np.stack(
        [rng.uniform(-20, 20, L), rng.uniform(-5, 3, L),
         rng.uniform(8, 60, L)], axis=1).astype(np.float32)
    T_cw = np.broadcast_to(np.eye(4, dtype=np.float32), (P, 4, 4)).copy()
    T_cw[:, 2, 3] = -1.2 * np.arange(P)
    pc = np.einsum("pij,lj->lpi", T_cw[:, :3, :3], X) + T_cw[:, :3, 3]
    uv = pc[..., :2] / np.maximum(pc[..., 2:], 1e-6) * [718.856, 718.856] + [
        607.1928, 185.2157]
    prob = BAProblem(
        T_cw=jnp.asarray(T_cw),
        X=jnp.asarray(X + rng.normal(0, 0.1, X.shape).astype(np.float32)),
        uv=jnp.asarray(uv.astype(np.float32)),
        mask=jnp.asarray(pc[..., 2] > 1.0), K=K)
    solve = jax.jit(lambda p: ba_solve(p, iters=8, damping=1e-4))
    add("ba_20kf_5120lm_8it", solve, (prob,),
        lambda o: jax.block_until_ready(o.X))

    # --- SuperPoint extraction (bf16 backbone, 2048 kps) ---
    sp_cfg = VOConfig(extractor_type="superpoint", max_keypoints=2048)
    from visualodometry_tpu.frontend.superpoint import (
        make_superpoint_extract_fn,
    )

    sp = make_superpoint_extract_fn(sp_cfg)
    vsp = jax.jit(jax.vmap(sp))
    add("superpoint_extract_per_frame", vsp, (imgs,),
        lambda o: float(jnp.sum(o.kps)), per=8)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
