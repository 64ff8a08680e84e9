"""SuperPoint-based frontend wrapper for the VO engine.

Builds the jitted extractor closure the pipeline uses when
`cfg.extractor_type == "superpoint"` (the reference instantiates the
torch SuperPoint the same way at src/modules/frontend.py:17-22). Weights
initialize randomly unless a converted checkpoint is supplied via
`checkpoint_path` (see models/convert.py — no network access in this
environment to fetch the released weights).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend.interface import Features
from visualodometry_tpu.models.superpoint import (
    init_superpoint,
    superpoint_extract,
)


def _pad_to_multiple(img: jnp.ndarray, m: int = 8) -> jnp.ndarray:
    h, w = img.shape
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)))
    return img


def _default_weights_path():
    from pathlib import Path

    return (
        Path(__file__).resolve().parent.parent
        / "models"
        / "weights"
        / "superpoint_synthetic.pkl"
    )


def make_superpoint_extract_fn(
    cfg: VOConfig, checkpoint_path: str | None = None, seed: int = 0
):
    """Returns the PURE extract(img (H, W)) -> Features function.

    Accepts float in [0, 1] or uint8 (normalized on device). Not jitted —
    compose under jit/vmap/lax.map (the chunk runner maps it over a
    frame batch). Weight resolution order: explicit torch checkpoint
    (converted) > bundled synthetic-pretrained weights
    (models/train_superpoint.py, MagicPoint-style) > random init.
    """
    model, params = init_superpoint(jax.random.key(seed))
    if checkpoint_path is not None:
        from visualodometry_tpu.models.convert import load_torch_superpoint

        params = load_torch_superpoint(checkpoint_path, params)
    elif _default_weights_path().exists():
        from visualodometry_tpu.models.train_superpoint import load_params

        params = load_params(_default_weights_path())

    def _extract(img: jnp.ndarray) -> Features:
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        img = _pad_to_multiple(img.astype(jnp.float32))
        return superpoint_extract(
            model, params, img, max_keypoints=cfg.padded_keypoints
        )

    return _extract


def make_superpoint_extractor(
    cfg: VOConfig, checkpoint_path: str | None = None, seed: int = 0
):
    """Returns extract(img (H, W) [0,1]) -> Features, jitted per shape."""
    return jax.jit(
        make_superpoint_extract_fn(cfg, checkpoint_path, seed)
    )
