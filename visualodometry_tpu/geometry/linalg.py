"""Small-matrix linear algebra built on TPU-supported primitives.

TPU XLA supports `eigh` (symmetric eigendecomposition) and batched
LU solves, but general `eig` is CPU-only and large general SVDs are
expensive. Every null-space / SVD need in this engine involves tiny
matrices (4x4 DLT, 9x9 eight-point, 12x12 PnP-DLT, 3x3 essential), so we
express them all through batched `eigh` of the normal matrix A^T A, plus a
closed-form 3x3 SVD recovered from eigh + cross products. This keeps the
whole robust-estimation stack compilable into a single TPU program.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigvec(M: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., n, n).

    Used as the null-space extractor: for an overdetermined homogeneous
    system A x ~ 0, the minimizer of ||Ax|| with ||x||=1 is the smallest
    eigenvector of A^T A.
    """
    _, vecs = jnp.linalg.eigh(M)  # ascending eigenvalues
    return vecs[..., :, 0]


def nullvec(A: jnp.ndarray) -> jnp.ndarray:
    """Least-squares null vector of (..., m, n): argmin_{|x|=1} |A x|."""
    At = jnp.swapaxes(A, -1, -2)
    return smallest_eigvec(jnp.matmul(At, A, precision="highest"))


def svd3(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form SVD of (..., 3, 3) via eigh of E^T E.

    Returns (U, s, Vt) with s descending and U, V proper handling of the
    (near-)rank-2 case that arises for essential matrices: the third left
    singular vector is recovered as the cross product of the first two, so
    U stays orthogonal even when s[2] ~ 0.
    """
    EtE = jnp.matmul(jnp.swapaxes(E, -1, -2), E, precision="highest")
    w, V = jnp.linalg.eigh(EtE)  # ascending
    # reorder to descending singular values
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0))
    EV = jnp.matmul(E, V, precision="highest")
    u0 = EV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-12)
    u1 = EV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-12)
    # re-orthogonalize u1 against u0 (guards repeated singular values)
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-12)
    u2 = jnp.cross(u0, u1)
    # cross() fixes u2 only up to sign; align it with E v2 so that
    # U diag(s) V^T reconstructs E exactly even at full rank.
    d = jnp.sum(u2 * EV[..., :, 2], axis=-1, keepdims=True)
    u2 = jnp.where(d < 0.0, -u2, u2)
    U = jnp.stack([u0, u1, u2], axis=-1)
    Vt = jnp.swapaxes(V, -1, -2)
    return U, s, Vt


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (A + damping*I) x = b for symmetric PSD A (..., n, n)."""
    n = A.shape[-1]
    A = A + damping * jnp.eye(n, dtype=A.dtype)
    return jnp.linalg.solve(A, b)
