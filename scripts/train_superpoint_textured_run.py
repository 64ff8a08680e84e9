#!/usr/bin/env python
"""Train SuperPoint on textured homography pairs and save the weights.

Usage: python scripts/train_superpoint_textured_run.py \
    [steps] [out.pkl] [HxW] [batch]
Warm-starts from the best bundled checkpoint (textured > blobs — a
blobs -> texture -> higher-resolution curriculum across invocations),
trains with the warp-strength curriculum, saves to
models/weights/superpoint_textured.pkl, and prints the loss trace.
The fully-convolutional backbone transfers across sizes, but texture
statistics are resolution-dependent — finishing at a training size
nearer the deployment size measurably helps (see RESULTS.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/visualodometry_tpu/models/weights/superpoint_textured.pkl"
    )
    hw = (120, 160)
    if len(sys.argv) > 3:
        h, w = sys.argv[3].split("x")
        hw = (int(h), int(w))
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    corridor = "--corridor" in sys.argv  # final stage: deployment texture

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from visualodometry_tpu.models.train_superpoint import (
        load_params,
        save_params,
    )
    from visualodometry_tpu.models.train_superpoint_textured import (
        pretrain_textured,
    )

    init = None
    weights_dir = "/root/repo/visualodometry_tpu/models/weights"
    # curriculum: continue from the best prior stage (textured > blobs)
    for name in ("superpoint_textured.pkl", "superpoint_synthetic.pkl"):
        cand = os.path.join(weights_dir, name)
        if os.path.exists(cand):
            init = load_params(cand)
            print(f"warm-starting from {cand}", flush=True)
            break

    model, params, log = pretrain_textured(
        steps=steps, batch=batch, hw=hw, init_params=init,
        corridor=corridor,
    )
    for i, loss, det, desc in log:
        print(f"step {i}: loss {loss:.3f} (det {det:.3f} desc {desc:.3f})",
              flush=True)
    save_params(params, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
