"""ctypes binding for the native C++ decoder (native/decoder.cpp).

Builds libvodecode.so on first use (g++ -O3, cached next to the source,
rebuilt when the source is newer) and exposes:

    decode_gray(path) -> (H, W) float32 in [0, 1]
    decode_batch(paths, w, h, threads) -> (N, H, W) float32

Falls back to the PIL path (data/prefetch.decode_grayscale) when the
toolchain or zlib is unavailable, so the Python pipeline never hard-
depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "decoder.cpp"
_LIB = _SRC.parent / "libvodecode.so"
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                str(_SRC),
                str(_SRC.parent / "jpeg.cpp"),
                "-o",
                str(_LIB),
                "-lz",
                "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    newest_src = max(
        _SRC.stat().st_mtime, (_SRC.parent / "jpeg.cpp").stat().st_mtime
    )
    if not _LIB.exists() or _LIB.stat().st_mtime < newest_src:
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        _build_failed = True
        return None
    lib.vo_image_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vo_image_info.restype = ctypes.c_int
    lib.vo_decode_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vo_decode_gray.restype = ctypes.c_int
    lib.vo_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vo_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def image_info(path: str | Path) -> tuple[int, int]:
    """(W, H) of a PNG/PGM file via the native parser."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vo_image_info(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"cannot parse header of {path} (rc={rc})")
    return w.value, h.value


def decode_gray(path: str | Path) -> np.ndarray:
    """Native decode with PIL fallback."""
    lib = get_lib()
    if lib is None:
        from visualodometry_tpu.data.prefetch import decode_grayscale

        return decode_grayscale(path)
    try:
        w, h = image_info(path)
    except ValueError:
        from visualodometry_tpu.data.prefetch import decode_grayscale

        return decode_grayscale(path)
    out = np.empty((h, w), np.float32)
    rc = lib.vo_decode_gray(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w,
        h,
    )
    if rc != 0:
        from visualodometry_tpu.data.prefetch import decode_grayscale

        return decode_grayscale(path)
    return out


def decode_batch(
    paths, w: int, h: int, threads: int | None = None
) -> tuple[np.ndarray, int]:
    """Parallel native decode of uniform-size frames -> ((N, H, W), n_ok)."""
    lib = get_lib()
    if lib is None:
        from visualodometry_tpu.data.prefetch import decode_grayscale

        frames = np.stack([decode_grayscale(p) for p in paths])
        return frames.astype(np.float32), len(paths)
    n = len(paths)
    threads = threads or min(os.cpu_count() or 4, 16)
    out = np.empty((n, h, w), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    n_ok = lib.vo_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w,
        h,
        threads,
    )
    return out, n_ok
