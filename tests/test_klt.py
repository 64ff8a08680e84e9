"""Tests for the pyramidal KLT tracker."""

import numpy as np
import jax.numpy as jnp

from visualodometry_tpu.data.synthetic import make_scene, render_image
from visualodometry_tpu.ops.klt import klt_track


def _texture(rng, H=240, W=320, n=120):
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.stack(
        [rng.uniform(15, W - 15, n), rng.uniform(15, H - 15, n)], axis=1
    )
    for (x, y) in pts:
        s = rng.uniform(1.5, 3.0)
        a = rng.uniform(0.4, 1.0)
        img = np.maximum(
            img, a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * s * s))
        )
    return img.astype(np.float32), pts


class TestKLT:
    def test_integer_shift(self, rng):
        img, pts = _texture(rng)
        dx, dy = 5, 3
        shifted = np.roll(np.roll(img, dy, 0), dx, 1)
        kps = pts[:60].astype(np.float32)
        new_kps, tracked = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.ones(60, bool),
        )
        tracked = np.asarray(tracked)
        assert tracked.mean() > 0.85
        err = np.abs(np.asarray(new_kps)[tracked] - (kps[tracked] + [dx, dy]))
        assert np.median(err) < 0.1

    def test_subpixel_shift(self, rng):
        img, pts = _texture(rng)
        # subpixel shift via Fourier phase shift
        dx, dy = 2.3, -1.7
        f = np.fft.fft2(img)
        H, W = img.shape
        ky = np.fft.fftfreq(H)[:, None]
        kx = np.fft.fftfreq(W)[None, :]
        shifted = np.real(
            np.fft.ifft2(f * np.exp(-2j * np.pi * (kx * dx + ky * dy)))
        ).astype(np.float32)
        kps = pts[:60].astype(np.float32)
        new_kps, tracked = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.ones(60, bool),
        )
        tracked = np.asarray(tracked)
        assert tracked.mean() > 0.8
        err = np.linalg.norm(
            np.asarray(new_kps)[tracked] - (kps[tracked] + [dx, dy]), axis=1
        )
        assert np.median(err) < 0.2

    def test_large_motion_uses_pyramid(self, rng):
        img, pts = _texture(rng)
        dx = 14  # too big for single-level radius-4 LK; pyramid handles it
        shifted = np.roll(img, dx, 1)
        kps = pts[:60].astype(np.float32)
        new_kps, tracked = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.ones(60, bool), num_levels=4,
        )
        tracked = np.asarray(tracked)
        assert tracked.mean() > 0.6
        err = np.abs(np.asarray(new_kps)[tracked, 0] - (kps[tracked, 0] + dx))
        assert np.median(err) < 0.3

    def test_flat_regions_not_tracked(self):
        img = np.zeros((120, 160), np.float32)
        kps = np.array([[40.0, 40.0], [80.0, 60.0]], np.float32)
        _, tracked = klt_track(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(kps),
            jnp.ones(2, bool),
        )
        assert not np.asarray(tracked).any()

    def test_scene_frames(self, rng):
        """Track real projected landmarks between consecutive renders."""
        scene = make_scene(
            rng, num_frames=3, speed=0.6, num_landmarks=900,
            image_size=(320, 180),
        )
        img0 = render_image(scene, 0, dot_sigma=2.0)
        img1 = render_image(scene, 1, dot_sigma=2.0)

        # ground-truth correspondences of common visible landmarks
        def proj(f):
            T = scene.poses_T_wc[f]
            R = T[:3, :3].T
            t = -R @ T[:3, 3]
            pc = scene.landmarks @ R.T + t
            uv = pc[:, :2] / pc[:, 2:3]
            uv = uv * [scene.K[0, 0], scene.K[1, 1]] + [
                scene.K[0, 2], scene.K[1, 2]
            ]
            vis = (
                (pc[:, 2] > 2)
                & (uv[:, 0] > 10) & (uv[:, 0] < 310)
                & (uv[:, 1] > 10) & (uv[:, 1] < 170)
            )
            return uv, vis

        uv0, v0 = proj(0)
        uv1, v1 = proj(1)
        common = np.flatnonzero(v0 & v1)[:64]
        kps = uv0[common].astype(np.float32)
        new_kps, tracked = klt_track(
            jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(kps),
            jnp.ones(len(kps), bool),
        )
        tracked = np.asarray(tracked)
        assert tracked.mean() > 0.5
        err = np.linalg.norm(
            np.asarray(new_kps)[tracked] - uv1[common][tracked], axis=1
        )
        assert np.median(err) < 0.5


class TestKLTPatchSampling:
    def test_patch_path_matches_gather(self, rng):
        """The patch-DMA sampling path (TPU default, ops/klt.py
        _klt_track_patch) agrees with the gather path on tracked set
        and positions (sub-0.05 px: boundary-clip and tiny-level
        shared-sampling differences only)."""
        img, pts = _texture(rng)
        dx, dy = 3.4, -2.1
        from scipy.ndimage import shift as ndshift

        shifted = ndshift(img, (dy, dx), order=3, mode="nearest").astype(
            np.float32
        )
        kps = pts[:60].astype(np.float32)
        valid = np.ones(60, bool)
        nk_g, tr_g = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.asarray(valid), sampling="gather",
        )
        nk_p, tr_p = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.asarray(valid), sampling="patch_interpret",
        )
        tr_g, tr_p = np.asarray(tr_g), np.asarray(tr_p)
        # near-identical tracked sets
        assert (tr_g == tr_p).mean() > 0.95, (tr_g.sum(), tr_p.sum())
        both = tr_g & tr_p
        assert both.sum() >= 40
        d = np.abs(np.asarray(nk_g)[both] - np.asarray(nk_p)[both])
        assert d.max() < 0.05, d.max()
        # and both recover the true flow
        err = np.abs(np.asarray(nk_p)[both] - (kps[both] + [dx, dy]))
        assert np.median(err) < 0.1

    def test_patch_path_nondivisible_slots(self, rng):
        """Slot counts not divisible by the DMA group of 8 are padded
        internally and unpadded on return."""
        img, pts = _texture(rng)
        shifted = np.roll(img, 2, 1)
        kps = pts[:45].astype(np.float32)
        nk, tr = klt_track(
            jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(kps),
            jnp.ones(45, bool), sampling="patch_interpret",
        )
        assert nk.shape == (45, 2) and tr.shape == (45,)
        tr = np.asarray(tr)
        assert tr.mean() > 0.8
        err = np.abs(np.asarray(nk)[tr] - (kps[tr] + [2, 0]))
        assert np.median(err) < 0.1
