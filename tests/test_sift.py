"""Tests for the SIFT-style frontend: detection, repeatability, matching.

The contract is not OpenCV bit-parity but detector *capability*: strong
blobs are found near their true locations, keypoints track image shifts,
and descriptors of corresponding points match under the Lowe ratio test —
the properties the VO pipeline actually depends on.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend.matcher import match_descriptors
from visualodometry_tpu.frontend.sift import extract_sift

H, W = 256, 384


def _cfg(**kw):
    base = dict(
        extractor_type="sift",
        max_keypoints=512,
        sift_n_features=512,
        sift_contrast_threshold=0.02,
        sift_edge_threshold=10.0,
        sift_num_octaves=3,
    )
    base.update(kw)
    return VOConfig(**base)


def _blob_image(rng, n_blobs=80, seed_sigma=(1.5, 3.5)):
    img = np.zeros((H, W), np.float32)
    margin = 20
    pts = np.stack(
        [
            rng.uniform(margin, W - margin, n_blobs),
            rng.uniform(margin, H - margin, n_blobs),
        ],
        axis=1,
    )
    sig = rng.uniform(*seed_sigma, n_blobs)
    amp = rng.uniform(0.4, 1.0, n_blobs)
    yy, xx = np.mgrid[0:H, 0:W]
    for (x, y), s, a in zip(pts, sig, amp):
        img = np.maximum(
            img,
            a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * s * s)).astype(
                np.float32
            ),
        )
    return img, pts


class TestSiftDetector:
    @pytest.fixture(scope="class")
    def blobs(self):
        rng = np.random.default_rng(0)
        img, pts = _blob_image(rng)
        cfg = _cfg()
        feats = extract_sift(jnp.asarray(img), cfg)
        return img, pts, feats

    def test_finds_blobs(self, blobs):
        img, pts, feats = blobs
        kps = np.asarray(feats.kps)[np.asarray(feats.valid)]
        assert len(kps) >= 40
        # most true blob centers have a detection within 2.5 px
        d = np.linalg.norm(pts[:, None, :] - kps[None, :, :], axis=-1)
        hit = (d.min(axis=1) < 2.5).mean()
        assert hit >= 0.65, f"blob hit rate {hit:.2f}"

    def test_descriptors_normalized(self, blobs):
        _, _, feats = blobs
        v = np.asarray(feats.valid)
        norms = np.linalg.norm(np.asarray(feats.desc)[v], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        assert np.isfinite(np.asarray(feats.desc)).all()

    def test_shift_repeatability(self, blobs):
        img, pts, feats = blobs
        dx, dy = 7, 4
        shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        feats2 = extract_sift(jnp.asarray(shifted), _cfg())
        k1 = np.asarray(feats.kps)[np.asarray(feats.valid)]
        k2 = np.asarray(feats2.kps)[np.asarray(feats2.valid)]
        # for each original keypoint away from borders, expect a shifted twin
        interior = (
            (k1[:, 0] > 20)
            & (k1[:, 0] < W - 30)
            & (k1[:, 1] > 20)
            & (k1[:, 1] < H - 30)
        )
        k1 = k1[interior]
        target = k1 + [dx, dy]
        d = np.linalg.norm(target[:, None, :] - k2[None, :, :], axis=-1)
        rep = (d.min(axis=1) < 1.5).mean()
        assert rep > 0.8, f"repeatability {rep:.2f}"

    def test_matching_across_shift(self, blobs):
        img, pts, feats = blobs
        dx, dy = 7, 4
        shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        feats2 = extract_sift(jnp.asarray(shifted), _cfg())
        res = match_descriptors(
            feats.desc, feats.valid, feats2.desc, feats2.valid, ratio=0.8
        )
        idx = np.asarray(res.idx)
        mval = np.asarray(res.valid)
        k1 = np.asarray(feats.kps)
        k2 = np.asarray(feats2.kps)
        matched_pairs = mval.sum()
        assert matched_pairs > 30
        flow = k2[idx[mval]] - k1[mval]
        # matched flow must agree with the true shift for nearly all pairs
        good = (np.abs(flow - [dx, dy]) < 1.5).all(axis=1).mean()
        assert good > 0.85, f"match correctness {good:.2f}"

    def test_no_detections_on_flat_image(self):
        cfg = _cfg()
        feats = extract_sift(jnp.zeros((H, W)), cfg)
        assert not bool(np.asarray(feats.valid).any())


class TestOrientationPeakSplitting:
    def test_peaks2_layout_and_quality(self):
        """cfg.sift_orientation_peaks=2: same slot count, secondary
        slots share xy with their primary, secondary descriptors differ
        (different orientation frame), and a corner-rich texture
        produces at least some multi-peak keypoints."""
        rng = np.random.default_rng(9)
        # anisotropic texture (corners/gratings) so orientation
        # histograms genuinely carry multiple peaks
        yy, xx = np.mgrid[0:H, 0:W]
        img = 0.5 + 0.25 * np.sign(np.sin(xx * 0.35) * np.sin(yy * 0.3))
        img += 0.1 * rng.standard_normal((H, W))
        img = np.clip(img, 0, 1).astype(np.float32)

        from visualodometry_tpu.frontend.sift import _octave_budgets

        cfg1 = _cfg(sift_orientation_peaks=1)
        cfg2 = _cfg(sift_orientation_peaks=2)
        f1 = extract_sift(jnp.asarray(img), cfg1)
        f2 = extract_sift(jnp.asarray(img), cfg2)
        assert f2.kps.shape == f1.kps.shape  # slot count unchanged

        budgets = _octave_budgets(
            cfg2.padded_keypoints // 2, cfg2.sift_num_octaves
        )
        kps = np.asarray(f2.kps)
        desc = np.asarray(f2.desc)
        valid = np.asarray(f2.valid)
        off = 0
        n_secondary = 0
        for b in budgets:
            prim = slice(off, off + b)
            seco = slice(off + b, off + 2 * b)
            both = valid[prim] & valid[seco]
            n_secondary += int(both.sum())
            # secondary slots duplicate the keypoint position...
            np.testing.assert_array_equal(kps[seco][both], kps[prim][both])
            # ...but carry a distinct orientation frame
            if both.any():
                diff = np.abs(desc[seco][both] - desc[prim][both]).max(axis=1)
                assert (diff > 1e-3).all()
            off += 2 * b
        assert n_secondary >= 3, n_secondary


class TestFirstOctave:
    def test_upsampled_octave_adds_fine_keypoints(self, rng):
        """cfg.sift_first_octave=-1 reproduces cv2's upsampled base
        octave (r4): more keypoints from fine scales, coordinates still
        mapped to input pixels (ops/pyramid.build_pyramid)."""
        img, _ = _blob_image(rng, n_blobs=120, seed_sigma=(1.0, 2.5))
        f0 = extract_sift(jnp.asarray(img), _cfg())
        f1 = extract_sift(
            jnp.asarray(img),
            _cfg(sift_num_octaves=4, sift_first_octave=-1),
        )
        n0 = int(np.asarray(f0.valid).sum())
        n1 = int(np.asarray(f1.valid).sum())
        assert n1 > n0, (n0, n1)

        kps = np.asarray(f1.kps)[np.asarray(f1.valid)]
        assert kps[:, 0].min() >= 0 and kps[:, 0].max() < W
        assert kps[:, 1].min() >= 0 and kps[:, 1].max() < H

        # the fine octave localizes the same blobs: every fo=0 keypoint
        # has an fo=-1 keypoint within 2 px OR is a coarse-scale point
        k0 = np.asarray(f0.kps)[np.asarray(f0.valid)]
        d = np.linalg.norm(k0[:, None] - kps[None, :], axis=-1).min(1)
        assert np.median(d) < 2.0, np.median(d)
