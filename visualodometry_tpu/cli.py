"""Command-line driver: dataset -> prefetch -> engine -> metrics.

Mirrors the reference CLI surface (reference: src/main.py:19-30 — dataset
in {kitti, malaga, parking, own}, --path, --sequence) using argparse (tyro
is not a dependency here), and adds what the reference lacked: an explicit
--extractor flag (the reference required editing a dataclass default,
src/config/config.py:9), --ba to enable sliding-window bundle adjustment,
headless mode, and ATE reporting against the loaded ground truth
(loaded-but-unused in the reference, SURVEY.md §5.5).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native monocular VO")
    p.add_argument(
        "--dataset",
        choices=["kitti", "malaga", "parking", "own"],
        default="kitti",
    )
    p.add_argument("--path", type=Path, default=Path("data"))
    p.add_argument("--sequence", type=str, default="05")
    p.add_argument(
        "--extractor", choices=["sift", "superpoint"], default="sift"
    )
    p.add_argument("--ba", action="store_true", help="enable windowed BA")
    p.add_argument("--viz", action="store_true", help="spawn rerun viewer")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--prefetch-depth", type=int, default=4)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from visualodometry_tpu.config import get_config
    from visualodometry_tpu.core.pipeline import VOEngine
    from visualodometry_tpu.data.loaders import make_dataset
    from visualodometry_tpu.data.prefetch import PrefetchLoader
    from visualodometry_tpu.eval import ate_rmse

    loader = make_dataset(args.dataset, args.path, sequence=args.sequence)
    if not loader.image_files:
        print(f"Error: no images found under {args.path}", file=sys.stderr)
        return 1
    print(f"Loaded {len(loader.image_files)} images; K=\n{loader.K}")

    cfg = get_config(args.dataset, extractor=args.extractor)
    viz = None
    if args.viz:
        from visualodometry_tpu.viz.rerun_sink import RerunSink

        viz = RerunSink()

    engine = VOEngine(K=loader.K, cfg=cfg, enable_ba=args.ba, viz=viz)

    paths = loader.image_files[: args.max_frames]
    t0 = time.perf_counter()
    for i, img in enumerate(PrefetchLoader(paths, depth=args.prefetch_depth)):
        out = engine.process_frame(img)
        if i % 50 == 0:
            pos = np.asarray(out.T_wc)[:3, 3]
            print(
                f"frame {i}: init={bool(out.initialized)} "
                f"tracked={int(out.num_tracked)} pos={np.round(pos, 1)}"
            )
    dt = time.perf_counter() - t0

    result = {
        "frames": len(paths),
        "fps": round(len(paths) / dt, 2),
    }
    est = engine.positions()
    if loader.ground_truth is not None and len(est) >= 8:
        gt = loader.ground_truth[: len(est)]
        est_xz = est[:, [0, 2]]
        n = min(len(gt), len(est_xz))
        result["ate_xz_sim3"] = round(
            ate_rmse(est_xz[:n], gt[:n], align="sim3"), 3
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
