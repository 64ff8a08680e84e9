"""Native C++ decoder vs PIL oracle (PNG gray/RGB, PGM, batch API)."""

import numpy as np
import pytest
from PIL import Image

from visualodometry_tpu.data import native_decode


@pytest.fixture(scope="module")
def lib():
    lib = native_decode.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _write_png(path, arr, mode):
    Image.fromarray(arr, mode=mode).save(path)


class TestNativeDecoder:
    def test_gray_png(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (37, 53), dtype=np.uint8)
        p = tmp_path / "g.png"
        _write_png(p, arr, "L")
        assert native_decode.image_info(p) == (53, 37)
        out = native_decode.decode_gray(p)
        np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)

    def test_rgb_png(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        p = tmp_path / "c.png"
        _write_png(p, arr, "RGB")
        out = native_decode.decode_gray(p)
        luma = (
            0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        ) / 255.0
        np.testing.assert_allclose(out, luma, atol=2e-3)

    def test_pgm(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (16, 20), dtype=np.uint8)
        p = tmp_path / "i.pgm"
        with open(p, "wb") as f:
            f.write(b"P5\n# comment\n20 16\n255\n")
            f.write(arr.tobytes())
        assert native_decode.image_info(p) == (20, 16)
        out = native_decode.decode_gray(p)
        np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)

    def test_batch_parallel(self, tmp_path, lib, rng):
        paths = []
        arrs = []
        for i in range(12):
            arr = rng.integers(0, 256, (40, 60), dtype=np.uint8)
            p = tmp_path / f"f{i}.png"
            _write_png(p, arr, "L")
            paths.append(p)
            arrs.append(arr)
        out, n_ok = native_decode.decode_batch(paths, w=60, h=40, threads=4)
        assert n_ok == 12
        for i in range(12):
            np.testing.assert_allclose(out[i], arrs[i] / 255.0, atol=1e-6)

    def test_bad_file_zero_filled(self, tmp_path, lib):
        good = tmp_path / "ok.png"
        _write_png(good, np.full((8, 8), 128, np.uint8), "L")
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not a png")
        out, n_ok = native_decode.decode_batch([good, bad], w=8, h=8)
        assert n_ok == 1
        assert (out[1] == 0).all()

    def test_kitti_like_sizes(self, tmp_path, lib, rng):
        # KITTI frames are 1226x370 gray PNGs; full-size round trip
        arr = rng.integers(0, 256, (370, 1226), dtype=np.uint8)
        p = tmp_path / "kitti.png"
        _write_png(p, arr, "L")
        out = native_decode.decode_gray(p)
        np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)


class TestNativeJpeg:
    def test_baseline_jpeg_gray(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        p = tmp_path / "g.jpg"
        Image.fromarray(arr, mode="L").save(p, quality=95)
        assert native_decode.image_info(p) == (64, 48)
        out = native_decode.decode_gray(p)
        ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        # JPEG is lossy; compare against PIL's decode of the same file
        assert np.abs(out - ref).mean() < 0.01
        assert np.abs(out - ref).max() < 0.08

    def test_color_jpeg_420(self, tmp_path, lib, rng):
        # smooth color image (random noise stresses chroma ringing)
        yy, xx = np.mgrid[0:96:1, 0:128:1].astype(np.float32)
        r = (127 + 80 * np.sin(xx / 9) * np.cos(yy / 7)).astype(np.uint8)
        g = (127 + 80 * np.cos(xx / 13)).astype(np.uint8)
        b = (127 + 80 * np.sin(yy / 11)).astype(np.uint8)
        arr = np.stack([r, g, b], -1)
        p = tmp_path / "c.jpg"
        Image.fromarray(arr, mode="RGB").save(
            p, quality=90, subsampling=2  # 4:2:0
        )
        out = native_decode.decode_gray(p)
        # PIL converts via full YCbCr; our luma-only decode equals the Y
        # channel of the file
        ycc = np.asarray(Image.open(p).convert("YCbCr"), np.float32)
        ref = ycc[..., 0] / 255.0
        assert out.shape == ref.shape
        assert np.abs(out - ref).mean() < 0.01

    def test_restart_markers(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (64, 80), dtype=np.uint8)
        p = tmp_path / "r.jpg"
        # PIL writes DRI segments when restart markers requested
        Image.fromarray(arr, mode="L").save(p, quality=92, restart_marker_rows=2)
        out = native_decode.decode_gray(p)
        ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        assert np.abs(out - ref).mean() < 0.01

    def test_progressive_falls_back(self, tmp_path, lib, rng):
        arr = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        p = tmp_path / "prog.jpg"
        Image.fromarray(arr, mode="L").save(p, quality=90, progressive=True)
        # native parser rejects; python wrapper falls back to PIL
        out = native_decode.decode_gray(p)
        ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        np.testing.assert_allclose(out, ref, atol=1e-6)
