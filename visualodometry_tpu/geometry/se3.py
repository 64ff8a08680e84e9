"""SE(3) rigid-transform helpers (4x4 homogeneous matrices, batched)."""

from __future__ import annotations

import jax.numpy as jnp

from visualodometry_tpu.geometry.so3 import so3_exp


def make_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from (..., 3, 3) rotation and (..., 3) translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform (no linalg.inv).

    Replaces the reference's `np.linalg.inv` on poses
    (reference: src/modules/vo.py:101,149,260-261).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")
    return make_T(Rt, t_inv)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (..., 6) [rho, phi] -> (..., 4, 4) transform.

    Used by the BA pose update; the translation part uses the left Jacobian
    of SO(3) with a small-angle series.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + 1e-16)
    from visualodometry_tpu.geometry.so3 import so3_hat

    W = so3_hat(phi)
    W2 = jnp.matmul(W, W, precision="highest")
    small = theta_sq < 1e-8
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta_sq * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho, precision="highest")
    return make_T(R, t)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) points -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision="highest") + t[..., None, :]
