#!/usr/bin/env python
"""Stage-by-stage timing of the SIFT extractor + VO step on the chip.

Each stage is measured as a lax.scan of ITERS iterations with a carry
data-dependency (the carry perturbs the input), inside ONE jitted
program; wall time / ITERS is the per-iteration cost. This defeats both
dispatch-latency noise and any relay-level caching of repeated identical
dispatches (observed through the axon tunnel: re-dispatching the same
executable on the same buffers reads ~0 ms).

Usage: python scripts/profile_extract.py [n_slots] [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
H, W = 370, 1226


def scan_time(make_body, init_carry, iters=ITERS, label=""):
    """make_body() -> fn(carry) -> carry; returns ms/iter."""
    body = make_body

    @jax.jit
    def run(c0):
        def f(c, _):
            return body(c), None

        c, _ = jax.lax.scan(f, c0, None, length=iters)
        return c

    c = jax.block_until_ready(run(init_carry))  # compile + warm
    t0 = time.perf_counter()
    c = jax.block_until_ready(run(c))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{label}: {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    from visualodometry_tpu.config import get_config
    from visualodometry_tpu.frontend import sift as S
    from visualodometry_tpu.frontend.matcher import match_descriptors
    from visualodometry_tpu.ops.pyramid import build_pyramid

    cfg = get_config("kitti", extractor="sift").replace(
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        sift_contrast_threshold=0.015,
        sift_num_octaves=4,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W), np.float32))

    # --- full extractor ---
    def full_body(carry):
        im = img + carry * 1e-9
        f = S.extract_sift(im, cfg)
        return jnp.sum(f.desc) + jnp.sum(f.kps)

    scan_time(full_body, jnp.float32(0.0), label="extract_sift total")

    # --- pyramid only ---
    def pyr_body(carry):
        im = img + carry * 1e-9
        gauss, dogs = build_pyramid(
            im, cfg.sift_num_octaves, cfg.sift_scales_per_octave, cfg.sift_sigma
        )
        return sum(jnp.sum(d) for d in dogs)

    scan_time(pyr_body, jnp.float32(0.0), label="pyramid")

    budgets = S._octave_budgets(cfg.padded_keypoints, cfg.sift_num_octaves)

    # --- pyramid + detection ---
    def det_body(carry):
        im = img + carry * 1e-9
        gauss, dogs = build_pyramid(
            im, cfg.sift_num_octaves, cfg.sift_scales_per_octave, cfg.sift_sigma
        )
        acc = jnp.float32(0.0)
        for o in range(cfg.sift_num_octaves):
            kps = S.detect_octave(dogs[o], cfg, budgets[o])
            acc += jnp.sum(kps.xy) + jnp.sum(kps.response)
        return acc

    t_det = scan_time(det_body, jnp.float32(0.0), label="pyramid+detect")

    # --- pyramid + detect + orientation+descriptor (== full) ---
    # (full_body above); so ori+desc = full - det

    # --- matcher ---
    feats = jax.jit(lambda im: S.extract_sift(im, cfg))(img)
    feats = jax.block_until_ready(feats)

    def match_body(carry):
        d0 = feats.desc + carry * 1e-9
        m = match_descriptors(d0, feats.valid, feats.desc, feats.valid)
        return jnp.sum(m.idx.astype(jnp.float32)) + jnp.sum(m.valid)

    scan_time(match_body, jnp.float32(0.0), label=f"matcher jnp {N_SLOTS}^2")

    def match_body_p(carry):
        d0 = feats.desc + carry * 1e-9
        m = match_descriptors(
            d0, feats.valid, feats.desc, feats.valid, backend="pallas"
        )
        return jnp.sum(m.idx.astype(jnp.float32)) + jnp.sum(m.valid)

    try:
        scan_time(
            match_body_p, jnp.float32(0.0), label=f"matcher pallas {N_SLOTS}^2"
        )
    except Exception as e:  # noqa: BLE001
        print(f"matcher pallas: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
