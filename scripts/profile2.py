#!/usr/bin/env python
"""Sanity check: per-call blocked timing of extract_sift on the chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
H, W = 370, 1226


def main():
    from visualodometry_tpu.config import get_config
    from visualodometry_tpu.frontend.sift import extract_sift

    cfg = get_config("kitti", extractor="sift").replace(
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        sift_contrast_threshold=0.015,
        sift_num_octaves=4,
    )
    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(jnp.asarray(rng.random((H, W), np.float32)))
        for _ in range(4)
    ]

    f = jax.jit(lambda im: extract_sift(im, cfg))
    out = jax.block_until_ready(f(imgs[0]))
    print("valid count:", int(out.valid.sum()), "desc norm:", float(jnp.abs(out.desc).sum()))

    for i in range(8):
        im = imgs[i % 4]
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(im))
        print(f"call {i}: {(time.perf_counter() - t0) * 1000:.2f} ms")


if __name__ == "__main__":
    main()
