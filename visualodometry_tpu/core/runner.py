"""Chunked sequence runner: N frames per device dispatch via lax.scan.

Per-frame dispatch latency (host -> device -> host round trip, which on a
tunneled chip is milliseconds) would otherwise bound frames/sec. The
runner scans the full per-frame pipeline — feature extraction + the VO
step — over a stacked chunk of frames inside ONE jitted program: the
host uploads C images, gets C compact outputs back, and the device never
waits on the host inside a chunk. This is the TPU answer to the
reference's per-frame Python loop (reference: src/main.py:58-64).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.state import StepOutput, VOState
from visualodometry_tpu.core.step import make_step_fn
from visualodometry_tpu.frontend.interface import Features


def make_chunked_step_fn(
    cfg: VOConfig, K
) -> Callable[[VOState, Features], tuple[VOState, StepOutput]]:
    """Chunk runner over precomputed features: feats pytree (C, ...)."""
    step = make_step_fn(cfg, K)

    @jax.jit
    def run_chunk(state: VOState, feats_stack: Features):
        return jax.lax.scan(step, state, feats_stack)

    return run_chunk


def make_chunked_pipeline_fn(
    cfg: VOConfig, K, enable_ba: bool = False, matcher_params=None
) -> Callable:
    """Chunk runner over raw images (C, H, W): extraction + step (+ BA).

    Returns `run_chunk(state, imgs) -> (state, outputs)`; with
    `enable_ba=True` the carry is `(state, KFWindow)` instead and each
    chunk ends with a device-side windowed-BA refinement (ba/inloop.py)
    once the keyframe window is full. Both frontends are supported:
    cfg.extractor_type "sift" or "superpoint" (the learned CNN).
    """
    step = make_step_fn(cfg, K, matcher_params=matcher_params)

    # Two programs per chunk rather than one: extraction has no frame-to-
    # frame dependency, the sequential VO step scans over the extracted
    # features. Keeping them as separate dispatches compiles far faster
    # and (empirically) avoids a TPU runtime fault observed in the single
    # fused program; dispatch count is still O(1) per chunk.
    #
    if cfg.extractor_type == "superpoint":
        from visualodometry_tpu.frontend.superpoint import (
            make_superpoint_extract_fn,
        )

        sp_extract = make_superpoint_extract_fn(cfg)
        # the CNN batches well across frames (conv batch dim on the MXU)
        vextract = jax.jit(jax.vmap(sp_extract))
    else:
        from visualodometry_tpu.frontend.sift import make_batched_extract_fn

        # hybrid batching: the pyramid stage vmaps across the chunk
        # (band matmuls gain a batch axis — 2.4 -> 1.1 ms/frame), the
        # rest (top-k, patch DMA, per-keypoint contractions) stays a
        # lax.map over frames, where full-vmap degrades layouts
        # (measured 33.7 -> 23.0 ms/frame in r1)
        vextract = jax.jit(make_batched_extract_fn(cfg))
    scan_step = jax.jit(lambda st, fs: jax.lax.scan(step, st, fs))

    if not enable_ba:

        def run_chunk(state: VOState, imgs: jnp.ndarray):
            feats_stack = vextract(imgs)
            return scan_step(state, feats_stack)

        # expose the two compiled programs for cost/roofline analysis
        # (bench.py `_pct_speed_of_light`: the closure itself is not a
        # jitted fn, so XLA cost analysis must query its parts)
        run_chunk.jitted_programs = (vextract, scan_step)
        return run_chunk

    from visualodometry_tpu.ba.inloop import make_ba_chunk_fn

    ba_chunk = jax.jit(make_ba_chunk_fn(cfg, K))
    apply_delta = jax.jit(apply_pose_delta)

    def run_chunk_ba(carry, imgs: jnp.ndarray):
        state, win = carry
        feats_stack = vextract(imgs)
        state, outs = scan_step(state, feats_stack)
        state, win, delta = ba_chunk(state, win, feats_stack, outs)
        outs = apply_delta(outs, delta)
        return (state, win), outs

    return run_chunk_ba


def apply_pose_delta(outs: StepOutput, delta: jnp.ndarray) -> StepOutput:
    """Retro-correct a chunk's emitted poses by the BA pose delta."""
    # Retro-correct this chunk's emitted poses by the BA pose delta
    # from the newest keyframe on (frames after it were tracked in
    # that keyframe's frame of reference, so the rigid transport is
    # coherent; BA only runs when the window is full, which rules
    # out a reset after that keyframe — ba/inloop.py). Without this
    # the correction would only land on the NEXT chunk's outputs,
    # kinking the trajectory at the chunk boundary (measured: ATE
    # 0.24 vs 0.14 on the 24-frame fixture). A chunk that pushed NO
    # keyframe still solves once the window is full; its delta is
    # anchored on the window's newest keyframe from a PRIOR chunk,
    # and every frame of this chunk was tracked relative to that
    # keyframe — so the correction applies to the whole chunk
    # (ADVICE r2: leaving those frames uncorrected while the carried
    # state is transported recreates the boundary kink).
    C = outs.is_keyframe.shape[0]
    idx = jnp.arange(C)
    has_kf = jnp.any(outs.is_keyframe)
    last_kf = jnp.where(
        has_kf, C - 1 - jnp.argmax(outs.is_keyframe[::-1]), 0
    )
    mask = (idx >= last_kf)[:, None, None]
    return outs._replace(
        T_wc=jnp.where(
            mask,
            jnp.matmul(delta[None], outs.T_wc, precision="highest"),
            outs.T_wc,
        )
    )
