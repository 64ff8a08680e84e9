"""Prefetching host ingest pipeline: decode ahead, overlap with device work.

Replaces the reference's synchronous in-loop `cv2.imread` (reference:
src/main.py:58-64) with a background-thread pipeline: images are decoded
(PIL/imageio on host CPU) and normalized N frames ahead of the consumer,
so disk + decode latency hides behind device compute. This is the "host
pipeline parallelism" row of SURVEY.md §2.4.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np


def decode_grayscale(path: Path | str) -> np.ndarray:
    """Decode an image file to float32 grayscale in [0, 1] (PIL)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("L")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr


def decode_auto(path: Path | str) -> np.ndarray:
    """Prefer the native C++ decoder (PNG/PGM), fall back to PIL (JPEG...)."""
    from visualodometry_tpu.data import native_decode

    return native_decode.decode_gray(path)


class PrefetchLoader:
    """Iterate decoded frames with a bounded look-ahead queue.

    A daemon worker thread decodes ahead; `__iter__` yields in order.
    `depth` bounds memory (depth x frame bytes).
    """

    def __init__(
        self,
        paths: Iterable[Path | str],
        depth: int = 4,
        decode=decode_auto,
    ) -> None:
        self.paths = list(paths)
        self.depth = depth
        self.decode = decode

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            try:
                for p in self.paths:
                    if stop.is_set():
                        return
                    q.put(self.decode(p))
            finally:
                q.put(None)  # sentinel

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the worker's blocked put() can observe the stop
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
