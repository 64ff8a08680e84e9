"""Data-parallel multi-sequence VO: one state per sequence, sharded.

The VO step is vmapped over a batch of sequences and the batch axis is
sharded over the mesh's "seq" axis via NamedSharding annotations — the XLA
SPMD partitioner then runs each device group's sequences locally with zero
cross-device traffic (the DP row of SURVEY.md §2.4's strategy table).
Under vmap, the step's lax.cond branches become batched selects (every
branch runs for every lane), the standard SPMD trade for divergent control
flow. pjit-style annotation (rather than shard_map) is deliberate here:
the step has no collectives, so partitioning is purely a placement choice.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.state import VOState, init_state
from visualodometry_tpu.core.step import make_step_fn
from visualodometry_tpu.frontend.interface import Features


def init_batched_state(cfg: VOConfig, desc_dim: int, batch: int) -> VOState:
    """A batch of independent VO states (distinct RANSAC streams)."""
    states = [init_state(cfg, desc_dim, seed=cfg.seed + i) for i in range(batch)]
    return jax.tree.map(lambda *xs: jax.numpy.stack(xs), *states)


def shard_batched(tree, mesh: Mesh, axis: str = "seq"):
    """Place a batched pytree with its leading axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_multiseq_step_fn(
    cfg: VOConfig, K, mesh: Mesh, axis: str = "seq"
) -> Callable[[VOState, Features], tuple[VOState, object]]:
    """Batched step with the sequence axis sharded over `axis`.

    K: (3, 3) shared intrinsics. State/feature pytrees carry a leading
    batch axis B divisible by the axis size.
    """
    step = make_step_fn(cfg, K)
    vstep = jax.vmap(step)
    shard_b = NamedSharding(mesh, P(axis))

    return jax.jit(
        vstep,
        in_shardings=(shard_b, shard_b),
        out_shardings=(shard_b, shard_b),
    )
