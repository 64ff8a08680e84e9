"""Tests for the host engine, dataset loaders, prefetch, and CLI.

Loader tests use tiny fixture trees mimicking the real dataset layouts
(SURVEY.md §4: "dataset-loader tests on tiny fixture trees").
"""

import json
import numpy as np
import pytest

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.pipeline import VOEngine
from visualodometry_tpu.data.loaders import (
    KittiDataset,
    MalagaDataset,
    OwnDataset,
    ParkingDataset,
    make_dataset,
)
from visualodometry_tpu.data.prefetch import PrefetchLoader
from visualodometry_tpu.data.synthetic import (
    make_scene,
    render_features,
    render_image,
)

N_SLOTS = 512


def _cfg(**kw):
    base = dict(
        extractor_type="synthetic",
        max_keypoints=N_SLOTS,
        sift_n_features=N_SLOTS,
        min_median_flow=3.0,
        max_reproj_err=4.0,
        pnp_reproj_err=2.0,
        essential_hypotheses=256,
        pnp_hypotheses=256,
        map_capacity=4096,
        ba_window=3,
        ba_max_landmarks=256,
        ba_iters=4,
    )
    base.update(kw)
    return VOConfig(**base)


class TestEngine:
    def _run(self, enable_ba):
        rng = np.random.default_rng(7)
        cfg = _cfg()
        scene = make_scene(rng, num_frames=25, speed=1.2, turn_rate=0.003)
        engine = VOEngine(K=scene.K, cfg=cfg, enable_ba=enable_ba)
        outs = []
        for f in range(scene.num_frames):
            feats = render_features(scene, f, N_SLOTS, rng, pixel_noise=0.2)
            outs.append(engine.process_frame(None, feats=feats))
        return scene, engine, outs

    @pytest.mark.slow
    def test_engine_tracks(self):
        scene, engine, outs = self._run(enable_ba=False)
        assert bool(outs[-1].initialized)
        # trajectory covers the frames since the last reset (reference
        # clears it on failure, vo.py:295)
        n_since_reset = scene.num_frames - max(
            (i for i, o in enumerate(outs) if bool(o.did_reset)), default=0
        )
        assert len(engine.trajectory) >= min(n_since_reset, 10)

    def test_engine_with_ba(self):
        from visualodometry_tpu.eval import ate_rmse

        scene, engine, outs = self._run(enable_ba=True)
        assert bool(outs[-1].initialized)
        # BA ran (window filled) and kept the trajectory consistent
        est = engine.positions()
        start = next(i for i, o in enumerate(outs) if bool(o.initialized))
        ate = ate_rmse(est[start:], scene.gt_positions[start:], align="sim3")
        assert np.isfinite(ate)
        assert ate < 2.0, f"ATE with BA {ate:.3f}"


class TestLoaders:
    def _touch_images(self, d, names):
        d.mkdir(parents=True, exist_ok=True)
        for n in names:
            (d / n).write_bytes(b"")

    def test_kitti_layout(self, tmp_path):
        root = tmp_path / "kitti"
        self._touch_images(root / "05" / "image_0", ["000001.png", "000000.png"])
        (root / "poses").mkdir()
        poses = np.zeros((2, 12))
        poses[:, 3] = [0.0, 1.0]  # x
        poses[:, 11] = [0.0, 2.0]  # z
        np.savetxt(root / "poses" / "05.txt", poses)
        ds = KittiDataset(tmp_path, sequence="05")
        assert [p.name for p in ds.image_files] == ["000000.png", "000001.png"]
        np.testing.assert_allclose(ds.ground_truth, [[0, 0], [1, 2]])
        assert ds.K.shape == (3, 3) and ds.K[0, 0] == pytest.approx(718.856)

    def test_parking_layout(self, tmp_path):
        root = tmp_path / "parking"
        self._touch_images(root / "images", ["img_00000.png"])
        (root / "K.txt").write_text("100, 0, 50,\n0, 100, 40,\n0, 0, 1")
        poses = np.zeros((1, 12))
        np.savetxt(root / "poses.txt", poses)
        ds = ParkingDataset(tmp_path)
        np.testing.assert_allclose(
            ds.K, [[100, 0, 50], [0, 100, 40], [0, 0, 1]]
        )
        assert len(ds.image_files) == 1

    def test_malaga_layout(self, tmp_path):
        d = (
            tmp_path
            / "malaga"
            / "malaga-urban-dataset-extract-07_rectified_800x600_Images"
        )
        self._touch_images(
            d, ["a_left.jpg", "a_right.jpg", "b_left.jpg"]
        )
        ds = MalagaDataset(tmp_path)
        assert [p.name for p in ds.image_files] == ["a_left.jpg", "b_left.jpg"]
        assert ds.ground_truth is None

    def test_own_layout(self, tmp_path):
        root = tmp_path / "my_dataset"
        self._touch_images(root / "images", ["img_00000.jpg"])
        (root / "K.txt").write_text("1, 0, 0\n0, 1, 0\n0, 0, 1")
        ds = OwnDataset(tmp_path)
        assert len(ds.image_files) == 1

    def test_factory(self, tmp_path):
        with pytest.raises(ValueError):
            make_dataset("nope", tmp_path)


class TestPrefetch:
    def test_order_and_content(self, tmp_path):
        from PIL import Image

        paths = []
        for i in range(6):
            arr = np.full((8, 10), i * 30, np.uint8)
            p = tmp_path / f"f{i}.png"
            Image.fromarray(arr).save(p)
            paths.append(p)
        frames = list(PrefetchLoader(paths, depth=2))
        assert len(frames) == 6
        for i, f in enumerate(frames):
            assert f.shape == (8, 10)
            np.testing.assert_allclose(f, i * 30 / 255.0, atol=1e-3)


class TestCli:
    @pytest.mark.slow
    def test_end_to_end_kitti_fixture(self, tmp_path, capsys):
        """CLI on a rendered-image KITTI fixture tree."""
        from PIL import Image

        from visualodometry_tpu import cli

        rng = np.random.default_rng(11)
        scene = make_scene(
            rng,
            num_frames=10,
            speed=1.2,
            num_landmarks=1600,
            image_size=(320, 180),
        )
        root = tmp_path / "kitti"
        img_dir = root / "05" / "image_0"
        img_dir.mkdir(parents=True)
        for f in range(scene.num_frames):
            img = (render_image(scene, f, dot_sigma=1.8) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"{f:06d}.png")
        (root / "poses").mkdir()
        poses = np.zeros((scene.num_frames, 12))
        poses[:, 3] = scene.gt_positions[:, 0]
        poses[:, 11] = scene.gt_positions[:, 2]
        np.savetxt(root / "poses" / "05.txt", poses)

        rc = cli.main(
            [
                "--dataset",
                "kitti",
                "--path",
                str(tmp_path),
                "--sequence",
                "05",
                "--extractor",
                "sift",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        last = out.strip().splitlines()[-1]
        stats = json.loads(last)
        assert stats["frames"] == 10
        assert stats["fps"] > 0


@pytest.mark.slow
class TestSuperPointEngine:
    def test_superpoint_path_runs(self):
        """Engine with the SuperPoint extractor (random weights): the
        pipeline must run end-to-end and stay finite (matching quality
        needs converted pretrained weights, unavailable offline)."""
        rng = np.random.default_rng(0)
        cfg = _cfg(extractor_type="superpoint", max_keypoints=256)
        scene = make_scene(
            rng, num_frames=3, speed=1.2, num_landmarks=900,
            image_size=(320, 192),
        )
        engine = VOEngine(K=scene.K, cfg=cfg)
        assert engine.desc_dim == 256
        for f in range(3):
            img = render_image(scene, f, dot_sigma=2.0)
            out = engine.process_frame(img)
        assert np.isfinite(np.asarray(out.T_wc)).all()


@pytest.mark.slow
class TestCliChunked:
    def test_chunked_mode(self, tmp_path, capsys):
        from PIL import Image

        from visualodometry_tpu import cli

        rng = np.random.default_rng(3)
        scene = make_scene(
            rng, num_frames=12, speed=1.2, num_landmarks=1600,
            image_size=(320, 180),
        )
        root = tmp_path / "kitti"
        img_dir = root / "05" / "image_0"
        img_dir.mkdir(parents=True)
        for f in range(scene.num_frames):
            img = (render_image(scene, f, dot_sigma=1.8) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"{f:06d}.png")
        (root / "poses").mkdir()
        poses = np.zeros((scene.num_frames, 12))
        poses[:, 3] = scene.gt_positions[:, 0]
        poses[:, 11] = scene.gt_positions[:, 2]
        np.savetxt(root / "poses" / "05.txt", poses)

        rc = cli.main(
            [
                "--dataset", "kitti", "--path", str(tmp_path),
                "--sequence", "05", "--extractor", "sift", "--chunk", "4",
                "--max-keypoints", "512",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["frames"] == 12
        assert stats["fps"] > 0


@pytest.mark.slow
class TestCliKlt:
    def test_klt_mode(self, tmp_path, capsys):
        from PIL import Image

        from visualodometry_tpu import cli

        rng = np.random.default_rng(3)
        scene = make_scene(
            rng, num_frames=8, speed=1.0, num_landmarks=1200,
            image_size=(320, 180),
        )
        root = tmp_path / "kitti"
        img_dir = root / "05" / "image_0"
        img_dir.mkdir(parents=True)
        for f in range(scene.num_frames):
            img = (render_image(scene, f, dot_sigma=1.8) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"{f:06d}.png")
        (root / "poses").mkdir()
        np.savetxt(root / "poses" / "05.txt", np.zeros((8, 12)))

        rc = cli.main(
            [
                "--dataset", "kitti", "--path", str(tmp_path),
                "--sequence", "05", "--tracker", "klt",
                "--max-keypoints", "512",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["frames"] == 8
