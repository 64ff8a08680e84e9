#!/usr/bin/env python
"""SuperPoint r4 finetune: SIFT-teacher + depth-GT VO pairs @ 320x640.

Continues from the r3 corridor-curriculum checkpoint
(superpoint_textured.pkl) with the distillation stage
(models/vo_distill.py): alternating consecutive-frame batches (true
parallax, depth-reprojection correspondence) and homography batches
over the same pool (viewpoint invariance), both labeled by the engine's
cv2-parity SIFT frontend. Descriptor loss weight doubled (VERDICT r3
item 2 lever). Saves superpoint_vo.pkl, which the frontend loader
prefers.

Usage: python scripts/train_superpoint_r4.py [steps] [out.pkl]
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
_WARM = (
    "/root/repo/visualodometry_tpu/models/weights/superpoint_textured.pkl"
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/visualodometry_tpu/models/weights/superpoint_vo.pkl"
    )
    warm = sys.argv[3] if len(sys.argv) > 3 else _WARM
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_bench"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from visualodometry_tpu.models.superpoint import SuperPointBackbone
    from visualodometry_tpu.models.train_superpoint import load_params
    from visualodometry_tpu.models.vo_distill import (
        build_vo_pool,
        homography_pool_batch,
        loss_fn_sub,
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

    model = SuperPointBackbone()
    params = load_params(warm)
    print(f"warm start: {warm}", flush=True)
    hw = (320, 640)
    batch = 8
    tx = optax.adam(optax.cosine_decay_schedule(1.5e-4, steps, alpha=0.05))
    opt_state = tx.init(params)

    def loss2(params, batch):
        return loss_fn_sub(params, model, batch, desc_w=2.0, sub_w=0.5)

    @jax.jit
    def train_step(params, opt_state, b):
        (loss, aux), grads = jax.value_and_grad(loss2, has_aux=True)(
            params, b
        )
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
                f"det {float(aux[0]):.4f} desc {float(aux[1]):.4f} "
                f"sub {float(aux[2]):.4f}",
                flush=True,
            )
        i += 1

    with open(out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
