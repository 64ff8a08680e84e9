"""Patch-DMA sampling path vs the flat-gather path: identical features.

The patch path (ops/patches.py + _make_patch_sampler) must reproduce the
gather path exactly: same bf16 gradient field, same nearest-tap indices
(clipping to a clamped patch coincides with clipping to the image, see
_patch_origins), one-hot selection of bf16 values is exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend import sift as fs


def _cfg(**kw):
    base = dict(
        extractor_type="sift",
        max_keypoints=256,
        sift_n_features=256,
        sift_contrast_threshold=0.005,
        sift_num_octaves=2,
    )
    base.update(kw)
    return VOConfig(**base)


def _test_image(rng, H=192, W=320):
    # random blobs so DoG extrema exist at several scales
    img = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for _ in range(120):
        cy, cx = rng.uniform(5, H - 5), rng.uniform(5, W - 5)
        s = rng.uniform(1.0, 6.0)
        a = rng.uniform(0.2, 1.0) * rng.choice([-1, 1])
        img += a * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


@pytest.mark.unit
class TestPatchSamplingParity:
    def test_features_identical(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(_test_image(rng))
        f_gather = fs.extract_sift(img, _cfg(sift_sampling="gather"))
        f_patch = fs.extract_sift(img, _cfg(sift_sampling="patch"))
        assert bool(jnp.any(f_gather.valid)), "fixture produced no keypoints"
        np.testing.assert_array_equal(
            np.asarray(f_gather.valid), np.asarray(f_patch.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(f_gather.kps), np.asarray(f_patch.kps)
        )
        v = np.asarray(f_gather.valid)
        dg = np.asarray(f_gather.desc)[v]
        dp = np.asarray(f_patch.desc)[v]
        np.testing.assert_allclose(dp, dg, rtol=0, atol=1e-6)

    def test_border_keypoints_identical(self):
        """Keypoints near the image border exercise the clamped-origin
        equivalence (patch edge == image edge on the clamped side)."""
        rng = np.random.default_rng(5)
        H, W = 96, 128
        img = np.zeros((H, W), np.float32)
        ys, xs = np.mgrid[0:H, 0:W]
        # blobs hugging the detection border margin (8 px)
        for cy, cx in [(10, 10), (10, W - 11), (H - 11, 10), (H - 11, W - 11),
                       (12, W // 2), (H // 2, 12)]:
            img += np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 2.5**2))
        img /= img.max()
        cfg_g = _cfg(sift_sampling="gather", max_keypoints=128,
                     sift_n_features=128, sift_num_octaves=1)
        cfg_p = _cfg(sift_sampling="patch", max_keypoints=128,
                     sift_n_features=128, sift_num_octaves=1)
        f_g = fs.extract_sift(jnp.asarray(img), cfg_g)
        f_p = fs.extract_sift(jnp.asarray(img), cfg_p)
        assert bool(jnp.any(f_g.valid))
        v = np.asarray(f_g.valid)
        np.testing.assert_array_equal(v, np.asarray(f_p.valid))
        np.testing.assert_allclose(
            np.asarray(f_p.desc)[v], np.asarray(f_g.desc)[v],
            rtol=0, atol=1e-6,
        )

    def test_margin_fits_patch(self):
        cfg = _cfg()
        P = -(-(2 * (fs._patch_margin(cfg) + 1)) // 8) * 8
        assert fs._patch_margin(cfg) <= P // 2 - 1

    def test_unaligned_shape_identical(self):
        """Non-tile-multiple H/W (the real octave case, e.g. 613x306):
        the field must be padded to the (8, 128) grid and edge keypoints
        near the right/bottom must still sample identically to the
        gather path (ADVICE r2: the clamp `min(x0 & ~127, W - wide_x)`
        was only aligned when W % 128 == 0)."""
        rng = np.random.default_rng(7)
        H, W = 94, 330  # H % 8 = 6, W % 128 = 74
        img = np.zeros((H, W), np.float32)
        ys, xs = np.mgrid[0:H, 0:W]
        # blobs hugging every border plus the interior
        for cy, cx in [(10, 10), (10, W - 11), (H - 11, 10),
                       (H - 11, W - 11), (H - 11, W // 2), (H // 2, W - 11),
                       (H // 2, W // 2), (12, W - 40), (H - 13, W - 40)]:
            img += np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 2.5**2))
        img /= img.max()
        kw = dict(max_keypoints=128, sift_n_features=128, sift_num_octaves=1)
        f_g = fs.extract_sift(jnp.asarray(img), _cfg(sift_sampling="gather", **kw))
        f_p = fs.extract_sift(jnp.asarray(img), _cfg(sift_sampling="patch", **kw))
        assert bool(jnp.any(f_g.valid))
        v = np.asarray(f_g.valid)
        np.testing.assert_array_equal(v, np.asarray(f_p.valid))
        np.testing.assert_allclose(
            np.asarray(f_p.desc)[v], np.asarray(f_g.desc)[v],
            rtol=0, atol=1e-6,
        )
