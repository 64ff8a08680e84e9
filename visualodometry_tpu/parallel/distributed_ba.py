"""Distributed Schur BA: landmark blocks sharded over the mesh.

Every term of the reduced pose system (S, rhs) is a sum over landmarks, so
the distribution is: shard (X, uv, mask) over the "map" axis, compute
shard-local `landmark_contributions`, psum S and rhs across the axis, run
the tiny dense solve replicated, and back-substitute landmarks shard-
locally. One psum of (P·P·36 + P·6) floats per GN iteration is the entire
communication volume — it rides ICI.

Numerically identical to the single-device `ba_solve` (tested in
tests/test_distributed.py on the virtual CPU mesh, per SURVEY.md §4
"Distributed without a cluster").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from visualodometry_tpu.ba.solver import (
    BAProblem,
    apply_updates,
    landmark_contributions,
    reduced_solve,
)


def ba_solve_distributed(
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 8,
    damping: float = 1e-3,
    fixed_poses: int = 2,
    axis: str = "map",
) -> BAProblem:
    """Mesh-sharded BA solve. L must be divisible by the axis size."""
    damping = jnp.asarray(damping, prob.X.dtype)
    n_shards = mesh.shape[axis]
    assert prob.X.shape[0] % n_shards == 0, (
        f"landmark count {prob.X.shape[0]} not divisible by mesh axis "
        f"'{axis}' of size {n_shards}"
    )

    # replicate over every mesh axis except `axis`
    rep = P(*[None for _ in mesh.axis_names])
    shard_l = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, shard_l, shard_l, shard_l, rep),
        out_specs=(rep, shard_l),
    )
    def run(T, X, uv, mask, K):
        def body(_, carry):
            T, X = carry
            contrib = landmark_contributions(T, X, uv, mask, K, damping)
            S = jax.lax.psum(contrib.S, axis)
            rhs = jax.lax.psum(contrib.rhs, axis)
            delta_pose = reduced_solve(S, rhs, damping, fixed_poses)
            return apply_updates(T, X, delta_pose, contrib)

        T_out, X_out = jax.lax.fori_loop(0, iters, body, (T, X))
        return T_out, X_out

    T_new, X_new = run(prob.T_cw, prob.X, prob.uv, prob.mask, prob.K)
    return prob._replace(T_cw=T_new, X=X_new)
