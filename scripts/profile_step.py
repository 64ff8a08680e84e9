#!/usr/bin/env python
"""Scan-based timing of the VO step + its internals at operating points.

Usage: python scripts/profile_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def scan_time(body, init_carry, label="", iters=ITERS):
    @jax.jit
    def run(c0):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, c0, None, length=iters)
        return c

    c = jax.block_until_ready(run(init_carry))
    t0 = time.perf_counter()
    jax.block_until_ready(run(c))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label}: {dt:.2f} ms/iter", flush=True)
    return dt


def build(n_slots, ess_h, pnp_h, matcher_backend="jnp"):
    from visualodometry_tpu.config import get_config
    from visualodometry_tpu.core.state import init_state
    from visualodometry_tpu.core.step import make_step_fn
    from visualodometry_tpu.data.synthetic import make_scene, render_features

    cfg = get_config("kitti", extractor="sift").replace(
        extractor_type="synthetic",
        max_keypoints=n_slots,
        sift_n_features=n_slots,
        min_median_flow=3.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=ess_h,
        pnp_hypotheses=pnp_h,
        matcher_backend=matcher_backend,
    )
    rng = np.random.default_rng(0)
    scene = make_scene(rng, num_frames=12, speed=1.2, num_landmarks=6000)
    state = init_state(cfg, desc_dim=128)
    step = jax.jit(make_step_fn(cfg, scene.K))
    feats = [
        render_features(scene, t, n_slots, rng, pixel_noise=0.2)
        for t in range(12)
    ]
    for t in range(6):
        state, out = step(state, feats[t])
    state = jax.block_until_ready(state)
    return cfg, step, state, feats, scene


def main():
    from visualodometry_tpu.core.step import make_step_fn  # noqa: F401

    for n_slots, ess_h, pnp_h in [
        (4096, 512, 512),
        (4096, 128, 128),
        (2048, 512, 512),
        (2048, 128, 128),
    ]:
        cfg, step, state, feats, scene = build(n_slots, ess_h, pnp_h)
        f7 = jax.device_put(feats[7])
        raw_step = make_step_fn(cfg, scene.K)

        def body(st):
            st2, _ = raw_step(st, f7)
            # keep tracking state alive but force dependency
            return st2._replace(frame_id=st.frame_id)

        scan_time(
            body, state, label=f"step n={n_slots} essH={ess_h} pnpH={pnp_h}"
        )

    # internals at 4096/512
    cfg, step, state, feats, scene = build(4096, 512, 512)
    f7 = jax.device_put(feats[7])
    kf = state.keyframe
    K = jnp.asarray(scene.K, jnp.float32)

    from visualodometry_tpu.estimation.essential import (
        estimate_essential_ransac,
    )
    from visualodometry_tpu.estimation.pnp import solve_pnp_ransac
    from visualodometry_tpu.frontend.matcher import match_descriptors

    m = jax.jit(
        lambda: match_descriptors(kf.desc, kf.kp_valid, f7.desc, f7.valid)
    )()
    m = jax.block_until_ready(m)
    uv_ref = kf.kps
    uv_curr = f7.kps[m.idx]

    def ess_body(c):
        key = jax.random.key(0)
        r = estimate_essential_ransac(
            uv_ref + c * 1e-9, uv_curr, m.valid, K, cfg, key
        )
        return jnp.sum(r.E) + jnp.sum(r.inliers)

    scan_time(ess_body, jnp.float32(0.0), label="essential RANSAC H=512")

    from visualodometry_tpu.core.state import landmark_lookup

    lm_pts, lm_live = landmark_lookup(state.map, kf.ids)
    pv = m.valid & lm_live

    def pnp_body(c):
        key = jax.random.key(0)
        r = solve_pnp_ransac(lm_pts + c * 1e-9, uv_curr, pv, K, cfg, key)
        return jnp.sum(r.T_cw) + jnp.sum(r.inliers)

    scan_time(pnp_body, jnp.float32(0.0), label="PnP RANSAC H=512")

    def match_body(c):
        r = match_descriptors(
            kf.desc + c * 1e-9, kf.kp_valid, f7.desc, f7.valid
        )
        return jnp.sum(r.idx.astype(jnp.float32))

    scan_time(match_body, jnp.float32(0.0), label="matcher jnp 4096^2")

    from visualodometry_tpu.geometry.triangulation import triangulate_points
    from visualodometry_tpu.geometry.se3 import se3_inverse

    T_cw = se3_inverse(state.T_wc)

    def tri_body(c):
        pts, ok = triangulate_points(
            T_cw, T_cw, uv_ref + c * 1e-9, uv_curr, K, cfg, valid_in=m.valid
        )
        return jnp.sum(pts) + jnp.sum(ok)

    scan_time(tri_body, jnp.float32(0.0), label="triangulation 4096")


if __name__ == "__main__":
    main()
