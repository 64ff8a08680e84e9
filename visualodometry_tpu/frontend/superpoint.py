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
    """Best bundled checkpoint: textured-trained > blob-pretrained.

    The textured recipe (models/train_superpoint_textured.py) supersedes
    the blob one — the blob-trained CNN measured repeatability 0.30 /
    precision 0.34 on the textured fixture and lost tracking, while the
    textured-trained one is the working learned frontend.
    """
    from pathlib import Path

    weights = Path(__file__).resolve().parent.parent / "models" / "weights"
    for name in (
        "superpoint_dense.pkl",  # r5 dense scoring head (NMS-aware)
        "superpoint_vo.pkl",  # r4 SIFT-teacher + depth-GT VO-pair stage
        "superpoint_textured.pkl",
        "superpoint_synthetic.pkl",
    ):
        if (weights / name).exists():
            return weights / name
    return None


def make_superpoint_extract_fn(
    cfg: VOConfig,
    checkpoint_path: str | None = None,
    seed: int = 0,
    weights_path: str | None = None,
):
    """Returns the PURE extract(img (H, W)) -> Features function.

    Accepts float in [0, 1] or uint8 (normalized on device). Not jitted —
    compose under jit/vmap/lax.map (the chunk runner maps it over a
    frame batch). Weight resolution order: explicit in-repo pickle
    (`weights_path`) > explicit torch checkpoint (`checkpoint_path`,
    converted via models/convert.py) > bundled trained weights
    (textured-trained preferred, see _default_weights_path) > random
    init.
    """
    model, params = init_superpoint(jax.random.key(seed))
    if weights_path is not None:
        from visualodometry_tpu.models.train_superpoint import load_params

        params = load_params(weights_path)
    elif checkpoint_path is not None:
        from visualodometry_tpu.models.convert import load_torch_superpoint

        params = load_torch_superpoint(checkpoint_path, params)
    elif _default_weights_path() is not None:
        from visualodometry_tpu.models.train_superpoint import load_params

        params = load_params(_default_weights_path())

    # r5: the dense-scoring-head architecture is identified by its own
    # param names (models/superpoint.py::is_dense_params)
    from visualodometry_tpu.models.superpoint import (
        SuperPointDense,
        is_dense_params,
    )

    if is_dense_params(params):
        model = SuperPointDense()

    threshold = (
        cfg.superpoint_dense_threshold
        if is_dense_params(params)
        else cfg.superpoint_threshold
    )

    def _extract(img: jnp.ndarray) -> Features:
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) * (1.0 / 255.0)
        img = _pad_to_multiple(img.astype(jnp.float32))
        return superpoint_extract(
            model,
            params,
            img,
            max_keypoints=cfg.padded_keypoints,
            threshold=threshold,
            forstner=cfg.superpoint_forstner,
        )

    return _extract


def make_superpoint_extractor(
    cfg: VOConfig, checkpoint_path: str | None = None, seed: int = 0
):
    """Returns extract(img (H, W) [0,1]) -> Features, jitted per shape."""
    return jax.jit(
        make_superpoint_extract_fn(cfg, checkpoint_path, seed)
    )
