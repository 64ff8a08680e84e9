#!/usr/bin/env python
"""Attention matcher at the DEPLOYMENT operating point (VERDICT r2 item 5).

Runs the full chunked pipeline on the bench fixture with
matcher_type="attention" (models/attention_matcher.py, bundled
real-SIFT-trained depth-4 weights — permutation-equivariant over
keypoint slots with normalized-coordinate positional input, so the
512-slot training transfers to the 4096-slot operating point) and
reports fps + tracking health next to the ratio matcher's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from bench import _build_cfg, _load_fixture, bench_tpu_pipeline

    u8, gt, K = _load_fixture()
    cfg = _build_cfg().replace(matcher_type="attention")
    fps, health = bench_tpu_pipeline(u8, gt, K, cfg)
    print(f"attention matcher @4096 slots: {fps:.1f} fps, {health}")


if __name__ == "__main__":
    main()
