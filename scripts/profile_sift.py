#!/usr/bin/env python
"""Stage-by-stage timing of SIFT extraction on the chip.

Usage: python scripts/profile_sift.py [iters]
Each stage runs in a scanned loop with a data dependency carried through
the scan so identical re-dispatches can't be elided (tunnel pitfall).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
H, W = 370, 1226
N_SLOTS = 4096


def scan_time(body, init_carry, label="", iters=ITERS):
    @jax.jit
    def run(c0):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, c0, None, length=iters)
        return c

    c = jax.block_until_ready(run(init_carry))
    t0 = time.perf_counter()
    out = run(c)
    # sync via scalar fetch (block_until_ready unreliable through tunnel)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label}: {dt:.3f} ms/iter", flush=True)
    return dt


def main():
    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.frontend import sift as fs
    from visualodometry_tpu.ops.pyramid import build_pyramid

    cfg = VOConfig(
        extractor_type="sift",
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        sift_contrast_threshold=0.01,
        sift_num_octaves=3,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W), np.float32))

    # full extraction
    def full_body(im):
        f = fs.extract_sift(im, cfg)
        return im + jnp.mean(f.desc) * 1e-12

    scan_time(full_body, img, label="extract_sift full")

    # pyramid alone
    S = cfg.sift_scales_per_octave

    def pyr_body(im):
        gauss, dogs = build_pyramid(im, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma)
        return im + jnp.mean(dogs[0]) * 1e-12

    scan_time(pyr_body, img, label="  pyramid")

    gauss, dogs = jax.block_until_ready(
        jax.jit(lambda im: build_pyramid(im, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma))(img)
    )
    budgets = fs._octave_budgets(cfg.padded_keypoints, cfg.sift_num_octaves)

    # per-octave stages (octave 0 dominates: biggest image + biggest budget)
    for o in range(cfg.sift_num_octaves):
        d0, g0, k0 = dogs[o], gauss[o], budgets[o]

        def det_body(d, g0=g0, k0=k0):
            kps = fs.detect_octave(d, cfg, k0)
            return d + jnp.mean(kps.xy) * 1e-12

        scan_time(det_body, d0, label=f"  detect octave{o} (K={k0})")

        kps = jax.block_until_ready(
            jax.jit(lambda d, k0=k0: fs.detect_octave(d, cfg, k0))(d0)
        )

        def pack_body(g):
            gp = fs._pack_gradients(g)
            return g + jnp.mean(gp[:3].astype(jnp.float32)) * 1e-12

        scan_time(pack_body, g0, label=f"  pack_gradients octave{o}")

        gp = jax.block_until_ready(jax.jit(fs._pack_gradients)(g0))

        def ori_body(g, kps=kps, gp=gp):
            th = fs.compute_orientations(g, kps, gp)
            return g + jnp.mean(th) * 1e-12

        scan_time(ori_body, g0, label=f"  orientation octave{o}")

        theta = jax.block_until_ready(
            jax.jit(lambda g, kps=kps, gp=gp: fs.compute_orientations(g, kps, gp))(g0)
        )

        def desc_body(g, kps=kps, theta=theta, gp=gp):
            de = fs.compute_descriptors(g, kps, theta, gp)
            return g + jnp.mean(de) * 1e-12

        scan_time(desc_body, g0, label=f"  descriptors octave{o}")


if __name__ == "__main__":
    main()
