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
    p.add_argument(
        "--tracker",
        choices=["descriptor", "klt"],
        default="descriptor",
        help="correspondence engine: descriptor matching (reference "
        "semantics) or KLT candidate tracking (project-statement design)",
    )
    p.add_argument("--ba", action="store_true", help="enable windowed BA")
    p.add_argument(
        "--smooth",
        action="store_true",
        help="loop-free pose-graph smoothing over the keyframe chain "
        "before evaluation (per-frame engine; pairs with --ba, whose "
        "refined window edges the smoother fuses)",
    )
    p.add_argument("--viz", action="store_true", help="spawn rerun viewer")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--prefetch-depth", type=int, default=4)
    p.add_argument(
        "--max-keypoints",
        type=int,
        default=0,
        help="override the keypoint slot count (0 = per-dataset default)",
    )
    p.add_argument(
        "--chunk",
        type=int,
        default=0,
        help="frames per device dispatch (0 = per-frame engine; chunked "
        "mode uses the scan runner + native batch decode, SIFT only, "
        "no viz)",
    )
    p.add_argument(
        "--platform",
        choices=["default", "cpu"],
        default="default",
        help="JAX platform: 'cpu' forces host execution (the environment's "
        "TPU plugin otherwise force-selects the chip regardless of "
        "JAX_PLATFORMS; use this to run when no healthy chip is attached)",
    )
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="override any VOConfig field after the per-dataset defaults "
        "(repeatable), e.g. --set min_median_flow=3 --set "
        "sift_num_octaves=3. The per-dataset gates are tuned for the "
        "real datasets; synthetic fixtures need scene-matched gates.",
    )
    return p


def _apply_overrides(cfg, pairs: list[str]):
    """Apply --set KEY=VALUE pairs, coercing to the field's current type."""
    for pair in pairs:
        key, _, raw = pair.partition("=")
        if not _ or not hasattr(cfg, key):
            raise SystemExit(f"--set: unknown config field {key!r}")
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        else:
            val = raw
        cfg = cfg.replace(**{key: val})
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compile cache: the chunked runner's scan programs
    # take minutes to compile on the chip; repeat CLI invocations at the
    # same shapes should pay that once (tests/bench already do this).
    jax.config.update("jax_compilation_cache_dir", str(Path.cwd() / ".jax_cache_cli"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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
    if args.max_keypoints > 0:
        cfg = cfg.replace(
            max_keypoints=args.max_keypoints,
            sift_n_features=args.max_keypoints,
        )
    cfg = _apply_overrides(cfg, args.overrides)

    if args.tracker == "klt":
        return _run_klt(args, loader, cfg)

    if args.chunk > 0:
        return _run_chunked(args, loader, cfg)

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
    est = engine.positions(smoothed=args.smooth)
    if loader.ground_truth is not None and len(est) >= 8:
        gt = loader.ground_truth[: len(est)]
        est_xz = est[:, [0, 2]]
        n = min(len(gt), len(est_xz))
        result["ate_xz_sim3"] = round(
            ate_rmse(est_xz[:n], gt[:n], align="sim3"), 3
        )
    print(json.dumps(result))
    return 0


def _run_chunked(args, loader, cfg) -> int:
    """High-throughput path: native batch decode + scan chunk runner."""
    import jax
    import jax.numpy as jnp

    from visualodometry_tpu.core import init_state
    from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
    from visualodometry_tpu.data import native_decode
    from visualodometry_tpu.eval import ate_rmse

    paths = loader.image_files[: args.max_frames]
    w, h = native_decode.image_info(paths[0])
    run = make_chunked_pipeline_fn(
        cfg, loader.K.astype(np.float32), enable_ba=args.ba
    )
    carry = init_state(
        cfg, desc_dim=256 if args.extractor == "superpoint" else 128
    )
    if args.ba:
        from visualodometry_tpu.ba.inloop import init_window

        carry = (carry, init_window(cfg))

    C = args.chunk
    positions = []
    t0 = time.perf_counter()
    n_full = len(paths) - len(paths) % C  # fixed shapes: drop the remainder
    for i in range(0, n_full, C):
        frames, n_ok = native_decode.decode_batch(paths[i : i + C], w, h)
        # uint8 upload: 4x fewer host->device bytes; normalized on device
        u8 = (np.clip(frames, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        carry, out = run(carry, jnp.asarray(u8))
        positions.append(np.asarray(out.T_wc)[:, :3, 3])
    dt = time.perf_counter() - t0

    est = (
        np.concatenate(positions) if positions else np.zeros((0, 3))
    )
    result = {"frames": int(n_full), "fps": round(n_full / max(dt, 1e-9), 2)}
    if loader.ground_truth is not None and len(est) >= 8:
        gt = loader.ground_truth[: len(est)]
        n = min(len(gt), len(est))
        result["ate_xz_sim3"] = round(
            ate_rmse(est[:n, [0, 2]], gt[:n], align="sim3"), 3
        )
    print(json.dumps(result))
    return 0


def _run_klt(args, loader, cfg) -> int:
    """KLT candidate-tracking mode (core/klt_step.py)."""
    import jax
    import jax.numpy as jnp

    from visualodometry_tpu.core.klt_step import (
        init_klt_state,
        make_klt_step_fn,
    )
    from visualodometry_tpu.data import native_decode
    from visualodometry_tpu.data.prefetch import PrefetchLoader
    from visualodometry_tpu.eval import ate_rmse
    from visualodometry_tpu.frontend.sift import extract_sift

    paths = loader.image_files[: args.max_frames]
    w, h = native_decode.image_info(paths[0])
    step = jax.jit(make_klt_step_fn(cfg, loader.K.astype(np.float32), (h, w)))
    state = init_klt_state(cfg, (h, w))

    positions = []
    t0 = time.perf_counter()
    for i, img in enumerate(PrefetchLoader(paths, depth=args.prefetch_depth)):
        imgj = jnp.asarray(img)
        feats = extract_sift(imgj, cfg)
        state, out = step(state, imgj, feats)
        positions.append(np.asarray(out.T_wc)[:3, 3])
        if i % 50 == 0:
            print(
                f"frame {i}: init={bool(out.initialized)} "
                f"tracked={int(out.num_tracked)} "
                f"landmarks={int(out.num_landmarks)}"
            )
    dt = time.perf_counter() - t0

    est = np.stack(positions) if positions else np.zeros((0, 3))
    result = {"frames": len(paths), "fps": round(len(paths) / dt, 2)}
    if loader.ground_truth is not None and len(est) >= 8:
        gt = loader.ground_truth[: len(est)]
        n = min(len(gt), len(est))
        result["ate_xz_sim3"] = round(
            ate_rmse(est[:n, [0, 2]], gt[:n], align="sim3"), 3
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
