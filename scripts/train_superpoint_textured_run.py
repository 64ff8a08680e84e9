#!/usr/bin/env python
"""Train SuperPoint on textured homography pairs and save the weights.

Usage: python scripts/train_superpoint_textured_run.py [steps] [out.pkl]
Starts from the bundled blob-pretrained weights when present (curriculum:
blobs -> texture), trains with the warp-strength curriculum, saves to
models/weights/superpoint_textured.pkl, and prints the loss trace.
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
    blob = "/root/repo/visualodometry_tpu/models/weights/superpoint_synthetic.pkl"
    if os.path.exists(blob):
        init = load_params(blob)
        print(f"warm-starting from {blob}", flush=True)

    model, params, log = pretrain_textured(
        steps=steps, batch=24, hw=(120, 160), init_params=init
    )
    for i, loss, det, desc in log:
        print(f"step {i}: loss {loss:.3f} (det {det:.3f} desc {desc:.3f})",
              flush=True)
    save_params(params, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
