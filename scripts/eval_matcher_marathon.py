#!/usr/bin/env python
"""Held-out-WORLD eval of an attention-matcher checkpoint (VERDICT r4 #5).

Drives the full engine with the attention matcher over the marathon
fixture's pre-blackout segment — a different world seed and double the
frame speed of every matcher training distribution — and reports
fps / resets / segment ATE. The r4 v2 checkpoint tracked this slice
with ONE mid-sequence reset where the SIFT ratio matcher has none; the
v3 deployment-regime training (scripts/train_matcher_v3.py) exists to
take that to zero.

Usage:
  python scripts/eval_matcher_marathon.py [weights.pkl] [n_frames]

With no argument, uses the engine's bundled-weight preference order
(core/step.py) — i.e. whatever would ship.
"""

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def main():
    weights = sys.argv[1] if len(sys.argv) > 1 else None
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 232

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_bench"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from bench import CHUNK, _build_cfg, _load_fixture_long
    from visualodometry_tpu.core import init_state
    from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
    from visualodometry_tpu.data.synthetic import segment_ate

    cfg = _build_cfg().replace(matcher_type="attention")
    matcher_params = None
    if weights:
        with open(weights, "rb") as f:
            matcher_params = jax.tree.map(jnp.asarray, pickle.load(f))
        print(f"weights: {weights}", flush=True)
    else:
        print("weights: engine bundled preference order", flush=True)

    u8, gt, K, blanks = _load_fixture_long()
    n = min(n, blanks[0][0])  # pre-blackout only
    n = (n // CHUNK) * CHUNK
    u8, gt = u8[:n], gt[:n]

    run = make_chunked_pipeline_fn(cfg, K, matcher_params=matcher_params)
    state = init_state(cfg, desc_dim=128)
    chunks = [jnp.asarray(u8[i : i + CHUNK]) for i in range(0, n, CHUNK)]
    float(jnp.sum(chunks[-1][:, ::37, ::37]))
    state, out0 = run(state, chunks[0])  # compile + warmup
    float(jnp.sum(out0.T_wc))
    outs = [out0]
    t0 = time.perf_counter()
    for c in chunks[1:]:
        state, out = run(state, c)
        outs.append(out)
    float(jnp.sum(out.T_wc))
    fps = (len(chunks) - 1) * CHUNK / (time.perf_counter() - t0)

    est = np.concatenate([np.asarray(o.T_wc)[:, :3, 3] for o in outs])
    resets = np.concatenate([np.asarray(o.did_reset) for o in outs])
    inited = np.concatenate([np.asarray(o.initialized) for o in outs])
    segs = segment_ate(est, gt, resets)
    print(
        f"marathon[:{n}] fps {fps:.1f} resets {int(resets.sum())} "
        f"(frames {np.nonzero(resets)[0].tolist()}) "
        f"tracking {bool(inited[-1])}",
        flush=True,
    )
    for s0, s1, a in segs:
        print(f"  segment {s0}-{s1}: ate {a:.2f} m", flush=True)


if __name__ == "__main__":
    main()
