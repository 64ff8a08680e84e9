"""On-chip parity check for the patch-DMA sampling path (ADVICE r2 high).

Runs extract_sift with sift_sampling="gather" vs "patch" on the REAL
Mosaic-compiled kernel (no interpret mode) at a non-tile-multiple shape
(the KITTI octave-1 shape 306x613: H % 8 != 0, W % 128 != 0) with
keypoints hugging the right/bottom edges — exactly the regime where the
pre-fix clamp produced misaligned DMA origins. CI covers the same case
in interpret mode (tests/test_sift_patches.py::test_unaligned_shape_identical);
this script is the hardware leg, run manually / at bench time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend import sift as fs


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    H, W = 306, 613  # KITTI half-res octave shape: H%8=2, W%128=101
    ys, xs = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), np.float32)
    centers = [(12, 12), (12, W - 13), (H - 13, 12), (H - 13, W - 13),
               (H - 13, W // 2), (H // 2, W - 13), (H - 40, W - 40)]
    centers += [(rng.uniform(10, H - 10), rng.uniform(10, W - 10))
                for _ in range(60)]
    for cy, cx in centers:
        s = rng.uniform(1.5, 4.0)
        img += rng.uniform(0.3, 1.0) * np.exp(
            -((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    img /= img.max()
    kw = dict(extractor_type="sift", max_keypoints=256, sift_n_features=256,
              sift_num_octaves=2, sift_contrast_threshold=0.005)
    f_g = fs.extract_sift(jnp.asarray(img), VOConfig(sift_sampling="gather", **kw))
    f_p = fs.extract_sift(jnp.asarray(img), VOConfig(sift_sampling="patch", **kw))
    v = np.asarray(f_g.valid)
    print(f"valid keypoints: {v.sum()}")
    assert v.sum() > 20, "fixture produced too few keypoints"
    np.testing.assert_array_equal(v, np.asarray(f_p.valid))
    dg, dp = np.asarray(f_g.desc)[v], np.asarray(f_p.desc)[v]
    err = np.abs(dg - dp).max()
    print(f"max |desc diff| = {err:.3e}")
    assert err <= 1e-6, err
    print("PATCH-DMA PARITY OK (unaligned shape, on-chip Mosaic kernel)")


if __name__ == "__main__":
    main()
