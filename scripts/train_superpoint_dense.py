#!/usr/bin/env python
"""Train the r5 dense-scoring-head SuperPoint (VERDICT r4 #2).

Warm-starts the shared encoder + descriptor head from the r4 VO-stage
checkpoint (superpoint_vo.pkl) and trains the new dense score head with
the NMS-aware recipe (models/train_superpoint_dense.py): balanced
detection BCE + inference-operator localization regression + descriptor
InfoNCE, on the SIFT-teacher/depth-GT pool (vo_distill), alternating
true-parallax VO pairs and homography pairs.

Usage: python scripts/train_superpoint_dense.py [steps] [out.pkl]
"""

import os
import pickle
import sys
import threading
import queue

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

_POOL = "/root/repo/.sp_vo_pool_v2.npz"
_WARM = "/root/repo/visualodometry_tpu/models/weights/superpoint_vo.pkl"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/visualodometry_tpu/models/weights/superpoint_dense.pkl"
    )
    # stage-2 continuation: [warm.pkl] [loc_w] [lr]
    warm_dense = sys.argv[3] if len(sys.argv) > 3 else None
    loc_w = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0
    lr = float(sys.argv[5]) if len(sys.argv) > 5 else 2e-4
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_bench"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from visualodometry_tpu.models.train_superpoint import load_params
    from visualodometry_tpu.models.train_superpoint_dense import (
        loss_fn_dense,
        warm_start_dense,
    )
    from visualodometry_tpu.models.vo_distill import (
        build_vo_pool,
        homography_pool_batch,
        vo_pair_batch,
    )

    rng = np.random.default_rng(4)
    print("building/loading VO pool...", flush=True)
    pool = build_vo_pool(rng, n_scenes=16, frames_per_scene=8, cache=_POOL)
    print(
        f"pool: {len(pool['imgs'])} frames, "
        f"label density {(pool['labels'] != 64).mean():.3f}",
        flush=True,
    )

    if warm_dense:
        from visualodometry_tpu.models.superpoint import SuperPointDense

        model = SuperPointDense()
        params = load_params(warm_dense)
        print(f"warm start (full dense): {warm_dense}", flush=True)
    else:
        model, params = warm_start_dense(
            jax.random.key(0), load_params(_WARM), input_hw=(320, 640)
        )
        print(f"warm start (encoder+desc): {_WARM}", flush=True)
    hw = (320, 640)
    batch = 8
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, b):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn_dense, has_aux=True
        )(params, model, b, loc_w=loc_w)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    q: queue.Queue = queue.Queue(maxsize=4)

    def producer():
        prng = np.random.default_rng(5)
        for i in range(steps):
            if i % 2 == 0:
                b = vo_pair_batch(prng, pool, batch=batch, hw=hw)
            else:
                b = homography_pool_batch(
                    prng, pool, batch=batch, hw=hw,
                    strength=0.04 + 0.08 * min(i / (0.4 * steps), 1.0),
                )
            q.put(b)
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    i = 0
    while True:
        b = q.get()
        if b is None:
            break
        params, opt_state, loss, aux = train_step(params, opt_state, b)
        if i % 250 == 0 or i == steps - 1:
            print(
                f"step {i}: loss {float(loss):.4f} "
                f"det {float(aux[0]):.4f} loc {float(aux[1]):.4f} "
                f"desc {float(aux[2]):.4f}",
                flush=True,
            )
        i += 1

    with open(out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
