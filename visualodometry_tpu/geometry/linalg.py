"""Small-matrix linear algebra as closed-form / unrolled TPU arithmetic.

Every null-space / SVD / solve need in this engine involves tiny matrices
(4x4 DLT, 9x9 eight-point, 12x12 PnP-DLT, 3x3 essential, 6x6 GN), batched
over thousands of instances. `jnp.linalg.eigh/svd/solve` lower these to
serialized QR/LU loops on TPU — measured 10-15 ms for a (512, 12, 12)
eigh batch, ~13 ms for a (4096, 4, 4) one, dominating the whole VO step.

This module instead provides:

- `eigh3`: closed-form symmetric 3x3 eigendecomposition (Cardano's
  trigonometric solution of the characteristic cubic + cross-product
  eigenvectors with degeneracy guards) — pure VPU arithmetic;
- `cholesky_small` / `cho_solve_small`: fully unrolled batched Cholesky
  factor/solve for static n (the n^3/3 scalar steps become ~n^2 fused
  vector ops over the batch);
- `smallest_eigvec`: the null-space extractor, via eigh3 for n=3 and
  shifted inverse iteration (Cholesky-preconditioned) for larger n —
  converges in a handful of iterations because the target eigenvalue of
  a (near-)singular normal matrix is far below the rest of the spectrum;
- `svd3`: 3x3 SVD built on eigh3, with the (near-)rank-2 essential-matrix
  case handled by re-orthogonalization + cross products.

Everything is batched over leading dims and compiles to elementwise VPU
code with no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-20


def eigh3(M: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form eigendecomposition of symmetric (..., 3, 3).

    Returns (w, V) with eigenvalues ascending (w: (..., 3)) and
    orthonormal eigenvectors in the columns of V ((..., 3, 3)), matching
    `jnp.linalg.eigh`'s convention. Pure arithmetic (Cardano + cross
    products); robust to repeated eigenvalues via most-isolated-first
    extraction and Gram-Schmidt.
    """
    dtype = M.dtype
    a00 = M[..., 0, 0]
    a01 = M[..., 0, 1]
    a02 = M[..., 0, 2]
    a11 = M[..., 1, 1]
    a12 = M[..., 1, 2]
    a22 = M[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00 = a00 - q
    b11 = a11 - q
    b22 = a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _TINY))

    # det(B)/2 with B = (M - q I) / p
    inv_p = 1.0 / p
    c00 = b00 * inv_p
    c01 = a01 * inv_p
    c02 = a02 * inv_p
    c11 = b11 * inv_p
    c12 = a12 * inv_p
    c22 = b22 * inv_p
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_p = 2.0 * p
    w2 = q + two_p * jnp.cos(phi)  # largest
    w0 = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2

    # near-diagonal / tiny-spread guard: if p2 ~ 0 all eigenvalues = q and
    # any orthonormal basis works; the cross-product machinery below falls
    # back to canonical axes via the `_any_orthonormal` guards.

    def eigvec(lam: jnp.ndarray) -> jnp.ndarray:
        """Eigenvector of M for eigenvalue lam via largest row cross."""
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c0 = jnp.cross(r0, r1)
        c1 = jnp.cross(r0, r2)
        c2 = jnp.cross(r1, r2)
        n0 = jnp.sum(c0 * c0, axis=-1)
        n1 = jnp.sum(c1 * c1, axis=-1)
        n2 = jnp.sum(c2 * c2, axis=-1)
        best12 = jnp.where((n1 >= n2)[..., None], c1, c2)
        nbest12 = jnp.maximum(n1, n2)
        v = jnp.where((n0 >= nbest12)[..., None], c0, best12)
        nv = jnp.maximum(n0, nbest12)
        # degenerate (repeated eigenvalue): fall back to e0; caller
        # re-orthogonalizes
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        v = jnp.where((nv > _TINY)[..., None], v, fallback)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # extract the most isolated eigenvalue first (its eigenvector is the
    # best conditioned), then the other extreme, then the cross product
    gap_low = w1 - w0
    gap_high = w2 - w1
    iso_is_low = gap_low >= gap_high
    lam_iso = jnp.where(iso_is_low, w0, w2)
    lam_other = jnp.where(iso_is_low, w2, w0)

    v_iso = eigvec(lam_iso)
    v_oth = eigvec(lam_other)
    # Gram-Schmidt v_oth against v_iso (guards repeated eigenvalues)
    v_oth = v_oth - jnp.sum(v_iso * v_oth, axis=-1, keepdims=True) * v_iso
    n_oth = jnp.linalg.norm(v_oth, axis=-1, keepdims=True)
    # if v_oth collapsed, take any unit vector orthogonal to v_iso
    alt = _any_orthonormal(v_iso)
    v_oth = jnp.where(n_oth > 1e-12, v_oth / jnp.maximum(n_oth, _TINY), alt)
    v_mid = jnp.cross(v_iso, v_oth)

    v0 = jnp.where(iso_is_low[..., None], v_iso, v_oth)
    v2 = jnp.where(iso_is_low[..., None], v_oth, v_iso)

    w = jnp.stack([w0, w1, w2], axis=-1).astype(dtype)
    V = jnp.stack([v0, v_mid, v2], axis=-1).astype(dtype)  # columns
    return w, V


def _any_orthonormal(v: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit v (..., 3), branchless."""
    ax = jnp.abs(v[..., 0])
    az = jnp.abs(v[..., 2])
    e = jnp.where(
        (ax <= az)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], v.dtype), v.shape),
    )
    u = jnp.cross(v, e)
    return u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), _TINY)


def inv3_sym(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of symmetric (..., 3, 3) matrices.

    `jnp.linalg.inv` lowers to a batched LU that serializes on TPU
    (measured ~7 ms for 5120 3x3 inverses on chip); the adjugate is pure
    VPU arithmetic. Intended for PD matrices (BA's V = B^T B + lambda I);
    the determinant is clamped away from zero so semidefinite inputs stay
    finite rather than producing infs.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _TINY, det, _TINY)
    row0 = jnp.stack([A, B, C], axis=-1)
    row1 = jnp.stack([B, D, E], axis=-1)
    row2 = jnp.stack([C, E, F], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def cholesky_small(M: jnp.ndarray):
    """Unrolled batched Cholesky of symmetric PD (..., n, n), static n.

    Returns the lower factor as a list-of-lists of (...,) arrays
    (L[i][j] for j <= i) — kept unpacked so the solve can stay unrolled.
    Pivots are clamped to stay finite on semidefinite input.
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, _TINY))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def cho_solve_small(L, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b with L from `cholesky_small`; b: (..., n)."""
    n = len(L)
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def smallest_eigvec(M: jnp.ndarray, iters: int = 24) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., n, n).

    The null-space extractor: for an overdetermined homogeneous system
    A x ~ 0, the minimizer of ||Ax|| with ||x||=1 is the smallest
    eigenvector of A^T A. n=3 uses the closed form; larger n uses shifted
    inverse iteration `v <- (M + eps I)^{-1} v` through one unrolled
    Cholesky factorization — the shift keeps the factor PD and the
    iteration converges geometrically at rate (lam_min+eps)/(lam_2+eps),
    which for (near-)singular normal matrices is effectively one step.
    The default iteration count covers the worst generic case (adjacent
    smallest eigenvalues, ratio ~0.7 -> ~24 iters to f32 precision); each
    iteration is just two unrolled triangular solves on the VPU.
    """
    n = M.shape[-1]
    if n == 3:
        _, V = eigh3(M)
        return V[..., :, 0]

    tr = jnp.trace(M, axis1=-2, axis2=-1)
    eps = (jnp.abs(tr) / n) * 1e-6 + 1e-12
    Ms = M + eps[..., None, None] * jnp.eye(n, dtype=M.dtype)
    L = cholesky_small(Ms)

    # deterministic start with all-index support (avoid orthogonality traps)
    v = jnp.broadcast_to(
        1.0 + 0.01 * jnp.arange(n, dtype=M.dtype), M.shape[:-1]
    )
    for _ in range(iters):
        v = cho_solve_small(L, v)
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), _TINY
        )
    return v


def nullvec(A: jnp.ndarray) -> jnp.ndarray:
    """Least-squares null vector of (..., m, n): argmin_{|x|=1} |A x|."""
    At = jnp.swapaxes(A, -1, -2)
    return smallest_eigvec(jnp.matmul(At, A, precision="highest"))


def svd3(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form SVD of (..., 3, 3) via eigh3 of E^T E.

    Returns (U, s, Vt) with s descending and U, V proper handling of the
    (near-)rank-2 case that arises for essential matrices: the third left
    singular vector is recovered as the cross product of the first two, so
    U stays orthogonal even when s[2] ~ 0.
    """
    EtE = jnp.matmul(jnp.swapaxes(E, -1, -2), E, precision="highest")
    w, V = eigh3(EtE)  # ascending
    # reorder to descending singular values
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0))
    EV = jnp.matmul(E, V, precision="highest")
    u0 = EV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-12)
    # re-normalize u0 (guards s[0] inaccuracies from the closed form)
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), 1e-12)
    u1 = EV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-12)
    # re-orthogonalize u1 against u0 (guards repeated singular values)
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u1 = jnp.where(n1 > 1e-12, u1 / jnp.maximum(n1, _TINY), _any_orthonormal(u0))
    u2 = jnp.cross(u0, u1)
    # cross() fixes u2 only up to sign; align it with E v2 so that
    # U diag(s) V^T reconstructs E exactly even at full rank.
    d = jnp.sum(u2 * EV[..., :, 2], axis=-1, keepdims=True)
    u2 = jnp.where(d < 0.0, -u2, u2)
    U = jnp.stack([u0, u1, u2], axis=-1)
    Vt = jnp.swapaxes(V, -1, -2)
    return U, s, Vt


def solve_psd_small(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (A + damping*I) x = b for small symmetric PD A via unrolled
    Cholesky; A: (..., n, n), b: (..., n), n static and modest (<= ~16)."""
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = cholesky_small(A)
    return cho_solve_small(L, b)


def solve_psd_pcg(
    A: jnp.ndarray, b: jnp.ndarray, iters: int = 48, block: int = 6
) -> jnp.ndarray:
    """Block-Jacobi-preconditioned CG for one SPD (n, n) system, n % block == 0.

    TPU-shaped alternative to a dense factorization: every CG iteration is
    one (n, n) matvec plus a batched unrolled block-triangular solve for
    the preconditioner — no serialized LAPACK loop.

    NOT the default for the Schur pose systems: measured on monocular BA
    reduced systems (cond >~ 1e6), f32 CG is erratic — under-converged at
    48-96 iterations, and round-off DIVERGENT (NaN) at 384 (the rz
    denominators denormalize once the residual bottoms out). Kept for
    well-conditioned systems where a caller can bound the iteration count.
    """
    n = A.shape[-1]
    nb = n // block
    # factor the block diagonal once (batched over blocks)
    diag = A.reshape(nb, block, nb, block)[
        jnp.arange(nb), :, jnp.arange(nb), :
    ]  # (nb, block, block)
    Ld = cholesky_small(diag)

    def precond(r):
        return cho_solve_small(Ld, r.reshape(nb, block)).reshape(n)

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.dot(r, z, precision="highest")

    def body(_, carry):
        x, r, p, rz = carry
        Ap = jnp.matmul(A, p, precision="highest")
        pAp = jnp.dot(p, Ap, precision="highest")
        alpha = rz / jnp.where(jnp.abs(pAp) > _TINY, pAp, _TINY)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z, precision="highest")
        beta = rz_new / jnp.where(jnp.abs(rz) > _TINY, rz, _TINY)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (A + damping*I) x = b for symmetric PSD A (..., n, n).

    Small systems (n <= 16) go through the fully unrolled Cholesky; larger
    ones (dense Schur pose systems) use the library solve. The LU there
    costs ~2.4 ms at 120x120 on chip (serialized), but the evaluated
    alternatives are worse: a blocked unrolled Cholesky measured 4.1 ms
    (scalar-op dispatch depth dominates), and f32 block-Jacobi PCG
    (`solve_psd_pcg`) is not robust on the ill-conditioned monocular
    reduced systems.
    """
    n = A.shape[-1]
    if n <= 16:
        return solve_psd_small(A, b, damping)
    A = A + damping * jnp.eye(n, dtype=A.dtype)
    return jnp.linalg.solve(A, b)
