"""VO state checkpoint / resume.

The reference persists nothing but a calibration matrix (SURVEY.md §5.4).
Here the full fixed-shape VO state — pose, keyframe, landmark ring buffer,
speed-smoothing scalars, RNG key — serializes to a single .npz, so a
crashed or migrated run resumes exactly (the state is a flat pytree of
arrays by construction; multi-host restarts reload the same file per
host and re-shard).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.core.state import VOState

_FORMAT_VERSION = 1


def _flatten(state: VOState) -> dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree.flatten(
        state._replace(rng_key=jax.random.key_data(state.rng_key))
    )
    for i, leaf in enumerate(leaves):
        flat[f"leaf_{i}"] = np.asarray(leaf)
    flat["__version__"] = np.asarray(_FORMAT_VERSION)
    return flat


def save_state(state: VOState, path: str | Path) -> None:
    np.savez_compressed(path, **_flatten(state))


def load_state(path: str | Path, template: VOState) -> VOState:
    """Restore a state with the same shapes as `template`."""
    data = np.load(path)
    assert int(data["__version__"]) == _FORMAT_VERSION, "checkpoint version"
    tmpl = template._replace(rng_key=jax.random.key_data(template.rng_key))
    leaves, treedef = jax.tree.flatten(tmpl)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        assert arr.shape == leaf.shape, (i, arr.shape, leaf.shape)
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    state = jax.tree.unflatten(treedef, new_leaves)
    return state._replace(rng_key=jax.random.wrap_key_data(state.rng_key))
