#!/usr/bin/env python
"""Frontend-quality report on the textured fixture: repeatability and
ratio-match precision/recall against ground-truth correspondence, for
any extractor ("sift" | "superpoint") and optional weights file.

Usage: python scripts/eval_frontend.py [sift|superpoint] [weights.pkl]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    extractor = sys.argv[1] if len(sys.argv) > 1 else "superpoint"
    weights = sys.argv[2] if len(sys.argv) > 2 else None

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.data.synthetic import (
        gt_correspondence,
        make_scene,
        render_textured_image,
    )

    rng = np.random.default_rng(3)
    scene = make_scene(
        rng, num_frames=4, speed=1.0, turn_rate=0.003, image_size=(640, 480)
    )
    img0, depth0 = render_textured_image(scene, 0, with_depth=True)
    img1 = render_textured_image(scene, 1)

    if extractor == "sift":
        from visualodometry_tpu.frontend.sift import extract_sift

        cfg = VOConfig(
            extractor_type="sift",
            max_keypoints=1024,
            sift_n_features=1024,
            sift_contrast_threshold=0.02,
            image_size=(640, 480),
        )
        feats = [extract_sift(jnp.asarray(im), cfg) for im in (img0, img1)]
    else:
        from visualodometry_tpu.frontend.superpoint import (
            make_superpoint_extract_fn,
        )

        cfg = VOConfig(
            extractor_type="superpoint",
            max_keypoints=1024,
            image_size=(640, 480),
        )
        extract = make_superpoint_extract_fn(cfg, weights_path=weights)
        feats = [extract(jnp.asarray(im)) for im in (img0, img1)]

    out = []
    for f in feats:
        v = np.asarray(f.valid)
        out.append((np.asarray(f.kps)[v], np.asarray(f.desc)[v]))
    (k0, d0), (k1, d1) = out
    print(f"{extractor}: {len(k0)} / {len(k1)} keypoints")

    uvb, ok = gt_correspondence(scene, 0, 1, k0, depth0)
    a = uvb[ok]
    dmin = np.linalg.norm(a[:, None, :] - k1[None, :, :], axis=-1).min(1)
    print(f"repeatability@3px: {(dmin < 3).mean():.3f} (n={len(a)})")

    # ratio-test matching
    import cv2

    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=False)
    knn = bf.knnMatch(d0.astype(np.float32), d1.astype(np.float32), k=2)
    pairs = [
        (mn[0].queryIdx, mn[0].trainIdx)
        for mn in knn
        if len(mn) == 2 and mn[0].distance < 0.9 * mn[1].distance
    ]
    if pairs:
        q = np.array([p[0] for p in pairs])
        t = np.array([p[1] for p in pairs])
        uvb, ok = gt_correspondence(scene, 0, 1, k0[q], depth0)
        err = np.linalg.norm(uvb - k1[t], axis=1)
        good = (err < 4) & ok
        # recall base: frame-0 keypoints whose GT target is visible
        print(
            f"ratio(.9) matches: {len(pairs)}, precision@4px: "
            f"{good.sum() / max(ok.sum(), 1):.3f}, correct: {int(good.sum())}"
        )
    else:
        print("no ratio matches")


if __name__ == "__main__":
    main()
