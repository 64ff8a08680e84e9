"""Pinhole camera projection and analytic Jacobians.

Replaces `cv2.projectPoints` (reference: src/modules/frontend.py:139,
src/utils/calibrate_camera.py:182). Distortion-free pinhole model — the
reference always passes `distCoeffs=None`. Jacobians are provided for the
Gauss-Newton BA solver.
"""

from __future__ import annotations

import jax.numpy as jnp


def project_points(
    pts_cam: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points (..., N, 3) to pixels (..., N, 2).

    Returns (uv, depth). Depth is passed back so callers can gate on
    cheirality without recomputing.
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
    x = pts_cam[..., 0] / z_safe
    y = pts_cam[..., 1] / z_safe
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = fx[..., None] * x + cx[..., None]
    v = fy[..., None] * y + cy[..., None]
    return jnp.stack([u, v], axis=-1), z


def project_points_T(
    pts_world: jnp.ndarray, T_cw: jnp.ndarray, K: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points through a camera-from-world transform.

    pts_world: (..., N, 3); T_cw: (..., 4, 4); returns (uv (..., N, 2), z).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    pts_cam = jnp.einsum("...ij,...nj->...ni", R, pts_world, precision="highest") + t[..., None, :]
    return project_points(pts_cam, K)


def projection_jacobian_point(
    pts_cam: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """d(uv)/d(pts_cam): (..., N, 2, 3) analytic Jacobian wrt camera-frame point."""
    X, Y, Z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    Zs = jnp.where(jnp.abs(Z) < eps, eps, Z)
    inv_z = 1.0 / Zs
    inv_z2 = inv_z * inv_z
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    zeros = jnp.zeros_like(X)
    fxb = jnp.broadcast_to(fx[..., None], X.shape)
    fyb = jnp.broadcast_to(fy[..., None], X.shape)
    row_u = jnp.stack([fxb * inv_z, zeros, -fxb * X * inv_z2], axis=-1)
    row_v = jnp.stack([zeros, fyb * inv_z, -fyb * Y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def pixels_to_normalized(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels (..., N, 2) to normalized image coordinates.

    Equivalent to applying K^{-1} to homogeneous pixels (pinhole, no
    distortion); written without a matrix inverse.
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx[..., None]) / fx[..., None]
    y = (uv[..., 1] - cy[..., None]) / fy[..., None]
    return jnp.stack([x, y], axis=-1)
