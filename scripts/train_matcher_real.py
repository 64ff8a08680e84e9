#!/usr/bin/env python
"""Train the attention matcher on REAL SIFT descriptors (homography GT).

Usage:
  python scripts/train_matcher_real.py [steps] [n_pairs] [out.pkl]

Builds (or loads, if cached) a dataset of SIFT features over textured
homography pairs (models/matcher_data.py), trains the depth-4 matcher,
and reports precision/recall on a held-out split vs the mutual-NN +
ratio baseline on the same problems.
"""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = "/root/repo/.matcher_dataset_sift.npz"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/visualodometry_tpu/models/weights/attention_matcher_sift.pkl"
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from visualodometry_tpu.models.attention_matcher import AttentionMatcher
    from visualodometry_tpu.models.matcher_data import (
        build_sift_match_dataset,
        sample_batch,
    )
    from visualodometry_tpu.models.train_matcher import (
        MatchBatch,
        evaluate,
        matcher_loss,
    )

    if os.path.exists(_CACHE):
        data = dict(np.load(_CACHE))
        print(f"loaded dataset {len(data['kps0'])} pairs from cache", flush=True)
    else:
        rng = np.random.default_rng(11)
        data = build_sift_match_dataset(rng, n_pairs=n_pairs)
        np.savez_compressed(_CACHE, **data)
        print(f"built dataset {n_pairs} pairs", flush=True)
    gt_rate = (data["gt_idx"] >= 0).mean()
    print(f"gt match rate per slot: {gt_rate:.3f}", flush=True)

    # held-out split
    n_total = len(data["kps0"])
    n_test = max(n_total // 8, 8)
    test = {k: v[:n_test] for k, v in data.items()}
    train = {k: v[n_test:] for k, v in data.items()}

    model = AttentionMatcher(depth=4)
    rng = np.random.default_rng(0)
    b0 = sample_batch(train, rng, 1)
    params = model.init(
        jax.random.key(0),
        b0.kps0[0], b0.desc0[0], b0.valid0[0],
        b0.kps1[0], b0.desc1[0], b0.valid1[0],
    )
    warm = "/root/repo/visualodometry_tpu/models/weights/attention_matcher_synthetic.pkl"
    if os.path.exists(warm):
        with open(warm, "rb") as f:
            params = jax.tree.map(jnp.asarray, pickle.load(f))
        print("warm-started from synthetic weights", flush=True)

    tx = optax.adam(optax.linear_schedule(2e-4, 2e-5, steps))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(matcher_loss)(params, model, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        b = sample_batch(train, rng, 16)
        params, opt_state, loss = step(params, opt_state, b)
        if i % 200 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    test_batch = MatchBatch(
        **{k: jnp.asarray(v) for k, v in zip(
            ("kps0", "desc0", "valid0", "kps1", "desc1", "valid1", "gt_idx"),
            (test["kps0"], test["desc0"], test["valid0"], test["kps1"],
             test["desc1"], test["valid1"], test["gt_idx"]),
        )}
    )
    p, r = evaluate(params, model, test_batch)
    print(f"attention matcher held-out: precision {p:.3f} recall {r:.3f}")

    # mutual-NN + ratio baseline on the same problems
    from visualodometry_tpu.frontend.matcher import match_descriptors

    tp = fp = fn = 0
    for b in range(len(test["kps0"])):
        res = match_descriptors(
            jnp.asarray(test["desc0"][b]), jnp.asarray(test["valid0"][b]),
            jnp.asarray(test["desc1"][b]), jnp.asarray(test["valid1"][b]),
            ratio=0.8, mutual=True,
        )
        idx, ok = np.asarray(res.idx), np.asarray(res.valid)
        gt = test["gt_idx"][b]
        tp += int(((gt == idx) & ok).sum())
        fp += int(((gt != idx) & ok).sum())
        fn += int(((gt >= 0) & ~ok).sum())
    print(
        f"mutual-NN ratio baseline: precision {tp / max(tp + fp, 1):.3f} "
        f"recall {tp / max(tp + fn, 1):.3f}"
    )

    with open(out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
