"""Loop-free pose-graph smoothing over a keyframe chain.

North-star config[3] ("KITTI full sequence, 20-keyframe window, ...,
loop-free pose graph smoothing"): given a chain of absolute pose estimates
and relative-pose measurements between consecutive (or skip) pairs,
minimize

    sum_e || log( Z_e^{-1} · T_i^{-1} · T_j ) ||^2_W

over SE(3) with Gauss-Newton. Edges are batched: every residual/Jacobian
is computed for all edges at once, and the block-tridiagonal (loop-free)
normal system is assembled dense (6P x 6P, tiny for window-scale P) and
solved directly. The first pose is gauge-fixed.

Jacobians use the standard first-order BCH approximation
(d log(exp(x) A)/dx ~ J_l^{-1}(log A) ~ I for small residuals), which is
exact at convergence — adequate for smoothing nearly-consistent VO chains.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualodometry_tpu.geometry.se3 import se3_exp, se3_inverse
from visualodometry_tpu.geometry.so3 import so3_log


class PoseGraph(NamedTuple):
    T_wc: jnp.ndarray  # (P, 4, 4) absolute poses (world-from-camera)
    edges_i: jnp.ndarray  # (E,) int32 source pose index
    edges_j: jnp.ndarray  # (E,) int32 target pose index
    Z: jnp.ndarray  # (E, 4, 4) measured relative transforms T_i^{-1} T_j
    weight: jnp.ndarray  # (E,) per-edge weight (0 disables an edge)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist [rho, phi] (inverse of se3_exp)."""
    phi = so3_log(T[..., :3, :3])
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + 1e-16)
    from visualodometry_tpu.geometry.so3 import so3_hat

    W = so3_hat(phi)
    W2 = jnp.matmul(W, W, precision="highest")
    # V^{-1} = I - W/2 + a W^2 with
    # a = (1/theta^2)(1 - theta sin / (2(1-cos))). The closed form
    # catastrophically cancels in f32 below theta ~ 1e-2 (1-cos theta
    # loses all bits), so the series branch must cover that whole regime.
    small = theta_sq < 1e-4
    one_minus_cos = 2.0 * (1.0 - jnp.cos(theta))
    a = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (
            1.0
            - theta * jnp.sin(theta) / jnp.where(small, 1.0, one_minus_cos)
        )
        / jnp.where(small, 1.0, theta_sq),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + a[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3], precision="highest")
    return jnp.concatenate([rho, phi], axis=-1)


def _residuals(T_wc: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    Ti = T_wc[g.edges_i]
    Tj = T_wc[g.edges_j]
    rel = jnp.matmul(se3_inverse(Ti), Tj, precision="highest")
    err_T = jnp.matmul(se3_inverse(g.Z), rel, precision="highest")
    return se3_log(err_T)  # (E, 6)


def pose_graph_cost(g: PoseGraph) -> jnp.ndarray:
    r = _residuals(g.T_wc, g)
    return jnp.sum(jnp.sum(r * r, axis=-1) * g.weight)


def smooth_pose_graph(
    g: PoseGraph, iters: int = 10, damping: float = 1e-6
) -> jnp.ndarray:
    """GN smoothing; returns refined (P, 4, 4) poses. Pose 0 is fixed.

    With the right-perturbation parameterization T_k <- T_k exp(x_k), the
    edge residual r_e = log(Z^{-1} T_i^{-1} T_j) has first-order Jacobians
    J_j = J_l^{-1}(r) ~ I and J_i = -Ad(rel^{-1}) ~ -Ad(Z^{-1}); we use
    the Gauss-Newton approximation J_j = I, J_i = -Ad(rel^{-1}).
    """
    P = g.T_wc.shape[0]
    E = g.edges_i.shape[0]

    def adjoint(T):
        # Ad(T) for twist order [rho, phi]: [[R, hat(t) R], [0, R]]
        from visualodometry_tpu.geometry.so3 import so3_hat

        R = T[..., :3, :3]
        t = T[..., :3, 3]
        tR = jnp.matmul(so3_hat(t), R, precision="highest")
        top = jnp.concatenate([R, tR], axis=-1)
        bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)  # (..., 6, 6)

    def body(_, T_wc):
        r = _residuals(T_wc, g)  # (E, 6)
        Ti = T_wc[g.edges_i]
        Tj = T_wc[g.edges_j]
        rel = jnp.matmul(se3_inverse(Ti), Tj, precision="highest")
        Ji = -adjoint(se3_inverse(rel))  # (E, 6, 6)
        w = g.weight[:, None, None]

        # dense normal system over all pose blocks
        H = jnp.zeros((P, P, 6, 6), T_wc.dtype)
        b = jnp.zeros((P, 6), T_wc.dtype)

        JiTJi = jnp.einsum("eki,ekj->eij", Ji * w, Ji, precision="highest")
        JiTr = jnp.einsum("eki,ek->ei", Ji * w, r, precision="highest")
        JjTJj = jnp.broadcast_to(jnp.eye(6, dtype=T_wc.dtype), (E, 6, 6)) * w
        JjTr = r * g.weight[:, None]
        JiTJj = jnp.einsum(
            "eki,ekj->eij", Ji * w,
            jnp.broadcast_to(jnp.eye(6, dtype=T_wc.dtype), (E, 6, 6)),
            precision="highest",
        )

        H = H.at[g.edges_i, g.edges_i].add(JiTJi)
        H = H.at[g.edges_j, g.edges_j].add(JjTJj)
        H = H.at[g.edges_i, g.edges_j].add(JiTJj)
        H = H.at[g.edges_j, g.edges_i].add(jnp.swapaxes(JiTJj, -1, -2))
        b = b.at[g.edges_i].add(JiTr)
        b = b.at[g.edges_j].add(JjTr)

        # gauge: freeze pose 0
        H = H.at[0, :].set(0.0).at[:, 0].set(0.0)
        H = H.at[0, 0].set(jnp.eye(6, dtype=T_wc.dtype))
        b = b.at[0].set(0.0)
        H = H.at[jnp.arange(P), jnp.arange(P)].add(
            damping * jnp.eye(6, dtype=T_wc.dtype)
        )

        Hd = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        delta = jnp.linalg.solve(Hd, b.reshape(P * 6)).reshape(P, 6)
        return jnp.matmul(T_wc, se3_exp(-delta), precision="highest")

    return jax.lax.fori_loop(0, iters, body, g.T_wc)
