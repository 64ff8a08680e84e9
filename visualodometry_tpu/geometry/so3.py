"""Closed-form SO(3) exponential / logarithm maps.

TPU-native replacement for `cv2.Rodrigues` (reference: src/modules/vo.py:144
uses rvec→R; src/modules/vo.py:159 uses R→rvec to measure relative-rotation
magnitude). Batched via vmap; numerically guarded with Taylor expansions near
the identity so gradients are clean for the BA Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle vector -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) -> (..., 3, 3) rotation matrix.

    Uses series expansions of sin(t)/t and (1-cos t)/t^2 near t=0.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    # sin(t)/t and (1 - cos t)/t^2 with small-angle series
    small = theta_sq < 1e-8
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    W = so3_hat(w)
    W2 = jnp.matmul(W, W, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Handles the three regimes: small angle (series), generic (asin-free
    stable form), and near-pi (via the symmetric part). Matches OpenCV's
    Rodrigues convention (rotation vector whose norm is the angle).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)

    # antisymmetric part: (R - R^T)/2 has entries sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)

    # generic: w = theta / (2 sin theta) * v ; small angle: w ≈ v/2 (1 + t^2/6)
    theta_sq = theta * theta
    small = theta < 1e-4
    factor_generic = theta / jnp.where(
        jnp.abs(sin_theta) < _EPS, _EPS, 2.0 * sin_theta
    )
    factor_small = 0.5 + theta_sq / 12.0
    factor = jnp.where(small, factor_small, factor_generic)
    w_generic = factor[..., None] * v

    # near pi: axis from the diagonal of (R + I)/2 = axis axis^T (1+cos)/2 ...
    # use the largest diagonal element of S = (R + I) for stability
    near_pi = theta > jnp.pi - 1e-3
    S = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]  # (...,3)
    col_norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis = col / jnp.where(col_norm < _EPS, _EPS, col_norm)
    # fix the sign so that axis agrees with the antisymmetric part
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians of (..., 3, 3) matrices.

    Equivalent to `norm(cv2.Rodrigues(R)[0])` as used for the turn detector
    (reference: src/modules/vo.py:157-160).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
