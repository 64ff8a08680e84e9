#!/usr/bin/env python
"""Extraction stage costs via the only timing pattern that is stable
through the tunnel: bench-style lax.map chunks (8 frames/dispatch,
several reps, scalar-fetch sync). Each variant truncates extract_sift
after a stage so differences give per-stage cost.

Usage: python scripts/profile_extract_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from bench import CHUNK, _build_cfg, _load_fixture
from visualodometry_tpu.frontend import sift as fs
from visualodometry_tpu.ops.pyramid import build_pyramid


def timed(fn, ims, label, reps=4):
    out = fn(ims)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ims)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / (reps * CHUNK) * 1000
    print(f"{label}: {ms:.2f} ms/frame", flush=True)
    return ms


def main():
    u8, gt, K = _load_fixture()
    cfg = _build_cfg()
    ims = jnp.asarray(u8[:CHUNK])
    S = cfg.sift_scales_per_octave

    def pyramid_only(img):
        img = img.astype(jnp.float32) * (1.0 / 255.0)
        gauss, dogs = build_pyramid(
            img, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma
        )
        return sum(jnp.sum(d) for d in dogs)

    budgets = fs._octave_budgets(cfg.padded_keypoints, cfg.sift_num_octaves)

    def detect_only(img):
        img = img.astype(jnp.float32) * (1.0 / 255.0)
        gauss, dogs = build_pyramid(
            img, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma
        )
        acc = jnp.float32(0)
        for o in range(cfg.sift_num_octaves):
            kps = fs.detect_octave(dogs[o], cfg, budgets[o])
            acc += jnp.sum(kps.xy) + jnp.sum(kps.response)
        return acc

    def with_patches(img):
        """pyramid + detect + pack + patch DMA (no orientation/desc)."""
        img = img.astype(jnp.float32) * (1.0 / 255.0)
        gauss, dogs = build_pyramid(
            img, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma
        )
        P = -(-(2 * (fs._patch_margin(cfg) + 1)) // 8) * 8
        from visualodometry_tpu.ops.patches import extract_patches

        acc = jnp.float32(0)
        for o in range(cfg.sift_num_octaves):
            kps = fs.detect_octave(dogs[o], cfg, budgets[o])
            _, H_o, W_o = gauss[o].shape
            wide = ((P + 127) // 128) * 128 + 128
            h_pad = -(-H_o // 8) * 8
            w_pad = max(-(-W_o // 128) * 128, wide)
            field = fs._pack_gradients_planar(gauss[o], h_pad, w_pad)
            y0, x0 = fs._patch_origins(kps, H_o, W_o, h_pad, P)
            lvl = jnp.clip(kps.scale_idx, 0, field.shape[0] - 1)
            patches = extract_patches(
                field, lvl, y0, x0, patch_y=P + 8, patch_x=P
            )
            acc += jnp.sum(patches.astype(jnp.float32))
        return acc

    def with_orientation(img):
        """everything except descriptors (splits orient vs desc)."""
        img = img.astype(jnp.float32) * (1.0 / 255.0)
        gauss, dogs = build_pyramid(
            img, cfg.sift_num_octaves, S, sigma0=cfg.sift_sigma
        )
        P = -(-(2 * (fs._patch_margin(cfg) + 1)) // 8) * 8
        from visualodometry_tpu.ops.patches import extract_patches

        acc = jnp.float32(0)
        for o in range(cfg.sift_num_octaves):
            kps = fs.detect_octave(dogs[o], cfg, budgets[o])
            _, H_o, W_o = gauss[o].shape
            wide = ((P + 127) // 128) * 128 + 128
            h_pad = -(-H_o // 8) * 8
            w_pad = max(-(-W_o // 128) * 128, wide)
            field = fs._pack_gradients_planar(gauss[o], h_pad, w_pad)
            y0, x0 = fs._patch_origins(kps, H_o, W_o, h_pad, P)
            lvl = jnp.clip(kps.scale_idx, 0, field.shape[0] - 1)
            patches = fs._unpack_patches(extract_patches(
                field, lvl, y0, x0, patch_y=P + 8, patch_x=P
            ))
            sampler = fs._make_patch_sampler(patches, y0, x0, H_o, W_o)
            hist = fs.orientation_histogram(gauss[o], kps, None, sampler)
            theta, _ = fs._hist_peak_angle(hist, jnp.argmax(hist, axis=-1))
            acc += jnp.sum(theta)
        return acc

    def full(img):
        f = fs.extract_sift(img, cfg)
        return jnp.sum(f.desc) + jnp.sum(f.kps)

    for name, body in [
        ("pyramid", pyramid_only),
        ("pyramid+detect", detect_only),
        ("pyr+det+pack+patchDMA", with_patches),
        ("pyr+det+patch+orient", with_orientation),
        ("full extract_sift", full),
    ]:
        fn = jax.jit(lambda b, body=body: jax.lax.map(body, b))
        timed(fn, ims, name)


if __name__ == "__main__":
    main()
