#!/usr/bin/env python
"""Train the v2 adaptive attention matcher (deep supervision, r4).

Warm-starts every shared tensor from the r3 real-SIFT checkpoint
(attention_matcher_sift.pkl), initializes each earlier layer's
assignment/matchability heads from the old shared (final) heads, and
trains with `matcher_loss_deep` so the per-layer confidence classifiers
learn LightGlue's depth-adaptivity signal. Reports held-out
precision/recall for the full-depth forward AND the adaptive inference
path (prune + early-exit) that deployment uses.

Usage: python scripts/train_matcher_v2.py [steps] [out.pkl]
"""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

_CACHE = "/root/repo/.matcher_dataset_sift.npz"
_OLD = (
    "/root/repo/visualodometry_tpu/models/weights/attention_matcher_sift.pkl"
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/visualodometry_tpu/models/weights/"
        "attention_matcher_sift_v2.pkl"
    )

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_bench"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from visualodometry_tpu.models.attention_matcher import (
        AttentionMatcher,
        adaptive_match,
    )
    from visualodometry_tpu.models.matcher_data import (
        build_sift_match_dataset,
        sample_batch,
    )
    from visualodometry_tpu.models.train_matcher import (
        evaluate,
        matcher_loss_deep,
    )

    if os.path.exists(_CACHE):
        data = dict(np.load(_CACHE))
        print(f"loaded dataset {len(data['kps0'])} pairs", flush=True)
    else:
        rng = np.random.default_rng(11)
        data = build_sift_match_dataset(rng, n_pairs=384)
        np.savez_compressed(_CACHE, **data)
        print("built dataset 384 pairs", flush=True)

    n_total = len(data["kps0"])
    n_test = max(n_total // 8, 8)
    test = {k: v[:n_test] for k, v in data.items()}
    train = {k: v[n_test:] for k, v in data.items()}

    depth = 4
    model = AttentionMatcher(depth=depth, per_layer_heads=True)
    rng = np.random.default_rng(0)
    b0 = sample_batch(train, rng, 1)
    params = model.init(
        jax.random.key(0),
        b0.kps0[0], b0.desc0[0], b0.valid0[0],
        b0.kps1[0], b0.desc1[0], b0.valid1[0],
        method="all_layers",
    )

    # warm start from the r3 shared-head checkpoint
    if os.path.exists(_OLD):
        with open(_OLD, "rb") as f:
            old = jax.tree.map(jnp.asarray, pickle.load(f))["params"]
        p = dict(params["params"])
        for k, v in old.items():
            p[k] = v
        for i in range(depth - 1):
            p[f"out_proj{i}"] = old["out_proj"]
            p[f"matchability{i}"] = old["matchability"]
        params = {"params": p}
        print("warm-started from r3 checkpoint", flush=True)

    tx = optax.adam(optax.cosine_decay_schedule(2e-4, steps, alpha=0.05))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(matcher_loss_deep)(
            params, model, batch
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    for i in range(steps):
        b = sample_batch(train, rng, 8)
        params, opt_state, loss = step(params, opt_state, b)
        if i % 200 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    # held-out eval: full depth vs adaptive inference
    tb = sample_batch({k: v for k, v in test.items()}, rng, n_test)
    prec, rec = evaluate(params, model, tb)
    print(f"held-out FULL: precision {prec:.3f} recall {rec:.3f}", flush=True)

    n_slots = tb.kps0.shape[1]
    for prune, ec in ((0, 0.0), (n_slots // 2, 0.0), (n_slots // 2, 0.9)):
        tp = fp = fn = 0
        for b in range(tb.kps0.shape[0]):
            res = adaptive_match(
                model, params,
                tb.kps0[b], tb.desc0[b], tb.valid0[b],
                tb.kps1[b], tb.desc1[b], tb.valid1[b],
                prune_to=prune, exit_conf=ec,
            )
            idx = np.asarray(res.idx)
            ok = np.asarray(res.valid)
            gt = np.asarray(tb.gt_idx[b])
            tp += int(np.sum(ok & (gt == idx)))
            fp += int(np.sum(ok & (gt != idx)))
            fn += int(np.sum(~ok & (gt >= 0)))
        print(
            f"held-out ADAPTIVE prune={prune} exit={ec}: "
            f"precision {tp / max(tp + fp, 1):.3f} "
            f"recall {tp / max(tp + fn, 1):.3f}",
            flush=True,
        )

    with open(out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
