#!/usr/bin/env python
"""Microbenchmark the attention matcher forward at the deployment point.

Measures (on the attached chip, chained dispatches to amortize tunnel
latency): full forward at 4096 slots f32 vs bf16, and at pruned slot
counts — the levers for VERDICT r3 item 3 (>=80 fps at the deployment
point). Chained timing pattern per RESULTS r2 ("identical re-dispatches
can read ~0 ms through the tunnel").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from visualodometry_tpu.models.attention_matcher import (
    AttentionMatcher,
    assignment_from_scores,
)


def timed(fn, args, reps=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain data dependence: perturb one input by a tiny data-dependent
    # amount so re-dispatches cannot be deduped
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(reps):
        out = fn(args[0] + acc * 1e-20, *args[1:])
        acc = out[0].ravel()[0].astype(jnp.float32)
    float(acc)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    model = AttentionMatcher(depth=4)
    import pickle

    with open(
        "/root/repo/visualodometry_tpu/models/weights/"
        "attention_matcher_sift.pkl",
        "rb",
    ) as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))

    for n in (4096, 2048, 1536):
        kps0 = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
        kps1 = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
        d0 = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
        d1 = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
        v = jnp.ones((n,), bool)

        fwd = jax.jit(
            lambda a, b, c, d, e, f: model.apply(params, a, b, c, d, e, f)
        )
        timed(fwd, (kps0, d0, v, kps1, d1, v), label=f"forward n={n} f32")

        full = jax.jit(
            lambda a, b, c, d, e, f: assignment_from_scores(
                *model.apply(params, a, b, c, d, e, f), c, f
            )
        )
        timed(
            full, (kps0, d0, v, kps1, d1, v), label=f"fwd+assign n={n} f32"
        )


if __name__ == "__main__":
    main()
