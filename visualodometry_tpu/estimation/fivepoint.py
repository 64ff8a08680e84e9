"""Batched Nistér five-point minimal solver for the essential matrix.

This is the true minimal solver behind `cv2.findEssentialMat` (reference:
src/modules/vo.py:87-94 uses OpenCV's five-point RANSAC). The 8-point
path in `estimation/essential.py` needs 8 correspondences per sample and
degenerates when the scene is planar (the parking dataset's dominant
facade, e.g.); the 5-point solver handles planar scenes and needs fewer
samples for the same RANSAC confidence (p_in^5 vs p_in^8 per draw).

Everything is batched over hypotheses with static shapes — no
data-dependent control flow — so H minimal problems compile to one XLA
program:

1. null space: the 4-dim null basis of the 5x9 epipolar system via
   subspace inverse iteration through one unrolled Cholesky
   (`null_basis`), the same machinery as `geometry/linalg.smallest_eigvec`;
2. constraint expansion: E(x,y,z) = x E1 + y E2 + z E3 + E4 substituted
   into det(E) = 0 and 2 E Eᵀ E − tr(E Eᵀ) E = 0 gives 10 cubic
   polynomials in (x, y, z). The coefficients over the 20-monomial cubic
   basis are expanded EXACTLY at trace time by a tiny polynomial-algebra
   helper (`_Poly3`) — no hand-derived coefficient tables, no
   interpolation conditioning; the result is a fused chain of batched
   multiply-adds;
3. Nistér elimination: Gauss-Jordan with partial pivoting on the
   (H, 10, 20) system (10 unrolled steps), then the three combined rows
   ⟨k⟩=⟨e⟩−z⟨f⟩, ⟨l⟩=⟨g⟩−z⟨h⟩, ⟨m⟩=⟨i⟩−z⟨j⟩ form a 3x3 polynomial
   matrix B(z) acting on (x, y, 1)ᵀ;
4. det B(z) is a degree-10 polynomial assembled with fixed-size
   polynomial convolutions; its roots are found with a fixed-iteration
   Durand-Kerner pass (all 10 roots simultaneously, complex arithmetic
   hand-rolled as (re, im) pairs — pure VPU code);
5. each (near-)real root back-substitutes through B(z) (largest
   cross-product null vector) to a candidate E, projected onto the
   essential manifold with the closed-form `svd3`.

Each minimal sample yields up to 10 candidates; all H*10 are scored
against all N correspondences with the Sampson distance in one batched
pass, exactly like the 8-point RANSAC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visualodometry_tpu.geometry.linalg import cholesky_small, cho_solve_small, svd3

_TINY = 1e-20

# Nistér's 20-monomial cubic basis x^i y^j z^k, split as 10 leading
# (eliminated) + 10 tail columns [xz², xz, x, yz², yz, y, z³, z², z, 1].
_MONOMIALS: tuple[tuple[int, int, int], ...] = (
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
)
_MONO_INDEX = {m: i for i, m in enumerate(_MONOMIALS)}


class _Poly3:
    """Trivariate polynomial with batched jnp coefficients, keyed by
    (i, j, k) exponents of x^i y^j z^k. Trace-time only: products and sums
    unroll into fused batched multiply-adds."""

    __slots__ = ("terms",)

    def __init__(self, terms: dict):
        self.terms = terms

    @staticmethod
    def linear(cx, cy, cz, c1) -> "_Poly3":
        return _Poly3({(1, 0, 0): cx, (0, 1, 0): cy, (0, 0, 1): cz, (0, 0, 0): c1})

    def __add__(self, other: "_Poly3") -> "_Poly3":
        t = dict(self.terms)
        for e, c in other.terms.items():
            t[e] = t[e] + c if e in t else c
        return _Poly3(t)

    def __sub__(self, other: "_Poly3") -> "_Poly3":
        t = dict(self.terms)
        for e, c in other.terms.items():
            t[e] = t[e] - c if e in t else -c
        return _Poly3(t)

    def __mul__(self, other: "_Poly3") -> "_Poly3":
        t: dict = {}
        for ea, ca in self.terms.items():
            for eb, cb in other.terms.items():
                e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
                prod = ca * cb
                t[e] = t[e] + prod if e in t else prod
        return _Poly3(t)

    def scale(self, s) -> "_Poly3":
        return _Poly3({e: c * s for e, c in self.terms.items()})

    def coeff_row(self, batch_shape, dtype) -> jnp.ndarray:
        """Coefficients over the 20-monomial basis: (..., 20)."""
        zeros = jnp.zeros(batch_shape, dtype)
        cols = [zeros] * 20
        for e, c in self.terms.items():
            cols[_MONO_INDEX[e]] = cols[_MONO_INDEX[e]] + c
        return jnp.stack(cols, axis=-1)


def null_basis(M: jnp.ndarray, k: int, iters: int = 8) -> jnp.ndarray:
    """Orthonormal basis of the k-dim smallest-eigenvalue subspace of
    symmetric PSD (..., n, n), via subspace inverse iteration.

    For the five-point normal matrix AᵀA (rank 5 of 9) the four target
    eigenvalues are (near-)zero and far below the rest of the spectrum, so
    the shifted iteration converges in a couple of steps. Returns
    (..., n, k) with orthonormal columns.
    """
    n = M.shape[-1]
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    eps = (jnp.abs(tr) / n) * 1e-6 + 1e-12
    Ms = M + eps[..., None, None] * jnp.eye(n, dtype=M.dtype)
    L = cholesky_small(Ms)

    # deterministic full-support start: shifted cosine columns
    i = jnp.arange(n, dtype=M.dtype)[:, None]
    j = jnp.arange(k, dtype=M.dtype)[None, :]
    V0 = jnp.cos((i + 1.0) * (j + 1.0)) + 0.1
    V = jnp.broadcast_to(V0, M.shape[:-2] + (n, k))

    def orthonormalize(V):
        cols = [V[..., :, c] for c in range(k)]
        out = []
        for c in range(k):
            v = cols[c]
            for u in out:
                v = v - jnp.sum(u * v, axis=-1, keepdims=True) * u
            nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
            # collapsed column: fall back to a canonical axis (degenerate
            # samples only; their candidates score ~0 inliers downstream)
            fallback = jnp.zeros_like(v).at[..., c].set(1.0)
            v = jnp.where(nv > 1e-12, v / jnp.maximum(nv, _TINY), fallback)
            out.append(v)
        return jnp.stack(out, axis=-1)

    for _ in range(iters):
        cols = [cho_solve_small(L, V[..., :, c]) for c in range(k)]
        V = orthonormalize(jnp.stack(cols, axis=-1))
    return V


def _constraint_rows(Ebasis: jnp.ndarray) -> jnp.ndarray:
    """The (..., 10, 20) cubic-constraint coefficient matrix.

    Ebasis: (..., 9, 4) — columns are the flattened null-space matrices
    E1, E2, E3, E4 with E(x,y,z) = x E1 + y E2 + z E3 + E4.
    """
    batch = Ebasis.shape[:-2]
    dtype = Ebasis.dtype

    # E entries as linear polynomials in (x, y, z)
    Ep = [
        _Poly3.linear(
            Ebasis[..., r * 3 + c, 0],
            Ebasis[..., r * 3 + c, 1],
            Ebasis[..., r * 3 + c, 2],
            Ebasis[..., r * 3 + c, 3],
        )
        for r in range(3)
        for c in range(3)
    ]

    def E(r, c):
        return Ep[r * 3 + c]

    # det(E) = 0
    det = (
        E(0, 0) * (E(1, 1) * E(2, 2) - E(1, 2) * E(2, 1))
        - E(0, 1) * (E(1, 0) * E(2, 2) - E(1, 2) * E(2, 0))
        + E(0, 2) * (E(1, 0) * E(2, 1) - E(1, 1) * E(2, 0))
    )

    # G = E Eᵀ (symmetric, degree-2 entries)
    G = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for c in range(r, 3):
            s = E(r, 0) * E(c, 0) + E(r, 1) * E(c, 1) + E(r, 2) * E(c, 2)
            G[r][c] = s
            G[c][r] = s
    trG = G[0][0] + G[1][1] + G[2][2]

    # 2 G E − tr(G) E = 0, entrywise (9 cubic constraints)
    rows = [det.coeff_row(batch, dtype)]
    two = jnp.asarray(2.0, dtype)
    for r in range(3):
        for c in range(3):
            GE = G[r][0] * E(0, c) + G[r][1] * E(1, c) + G[r][2] * E(2, c)
            poly = GE.scale(two) - trG * E(r, c)
            rows.append(poly.coeff_row(batch, dtype))
    return jnp.stack(rows, axis=-2)  # (..., 10, 20)


def _gauss_jordan_tail(A: jnp.ndarray) -> jnp.ndarray:
    """Reduce (..., 10, 20) to [I | B] with partial pivoting; return B."""
    n = A.shape[-2]
    # row equilibration: the cubic monomial columns are intrinsically badly
    # scaled when the (x, y, z) solution is large; unit-max rows keep the
    # f32 elimination honest
    rmax = jnp.max(jnp.abs(A), axis=-1, keepdims=True)
    A = A / jnp.maximum(rmax, _TINY)
    ar = jnp.arange(n)
    for col in range(n):
        colvals = jnp.abs(A[..., :, col])
        colvals = jnp.where(ar >= col, colvals, -1.0)
        piv = jnp.argmax(colvals, axis=-1)  # (...,)
        pivb = piv[..., None]
        perm = jnp.where(ar == col, pivb, jnp.broadcast_to(ar, pivb.shape[:-1] + (n,)))
        perm = jnp.where(ar == pivb, col, perm)
        A = jnp.take_along_axis(A, perm[..., :, None], axis=-2)
        pivot = A[..., col, col]
        inv_p = jnp.where(jnp.abs(pivot) > _TINY, 1.0 / pivot, 0.0)
        row = A[..., col, :] * inv_p[..., None]
        A = A.at[..., col, :].set(row)
        factors = A[..., :, col].at[..., col].set(0.0)
        A = A - factors[..., :, None] * row[..., None, :]
    return A[..., :, n:]


def _polymul(a: list, b: list) -> list:
    """Product of ascending-coefficient polynomials (lists of batched arrays)."""
    out = [None] * (len(a) + len(b) - 1)
    for i, ca in enumerate(a):
        for j, cb in enumerate(b):
            p = ca * cb
            out[i + j] = p if out[i + j] is None else out[i + j] + p
    return out


def _polysub(a: list, b: list) -> list:
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        ca = a[i] if i < len(a) else None
        cb = b[i] if i < len(b) else None
        if ca is None:
            out.append(-cb)
        elif cb is None:
            out.append(ca)
        else:
            out.append(ca - cb)
    return out


def _action_polys(B: jnp.ndarray):
    """The 3x3 polynomial matrix B(z) from the reduced tail B (..., 10, 10).

    Rows are Nistér's ⟨k⟩, ⟨l⟩, ⟨m⟩; columns multiply (x, y, 1). Tail
    monomial order: [xz², xz, x, yz², yz, y, z³, z², z, 1]. Returns
    (px, py, p1) per row: ascending z-coefficient lists of degree 3, 3, 4.
    """
    def combined(e: int, f: int):
        Be = B[..., e, :]
        Bf = B[..., f, :]
        # x-group cols (x, xz, xz²) = (2, 1, 0); e-row minus z * f-row
        px = _polysub([Be[..., 2], Be[..., 1], Be[..., 0]],
                      [jnp.zeros_like(Be[..., 2]), Bf[..., 2], Bf[..., 1], Bf[..., 0]])
        py = _polysub([Be[..., 5], Be[..., 4], Be[..., 3]],
                      [jnp.zeros_like(Be[..., 5]), Bf[..., 5], Bf[..., 4], Bf[..., 3]])
        p1 = _polysub([Be[..., 9], Be[..., 8], Be[..., 7], Be[..., 6]],
                      [jnp.zeros_like(Be[..., 9]), Bf[..., 9], Bf[..., 8], Bf[..., 7], Bf[..., 6]])
        return px, py, p1

    return combined(4, 5), combined(6, 7), combined(8, 9)


def _det_poly(rows) -> jnp.ndarray:
    """det of the 3x3 polynomial matrix → degree-10 poly, (..., 11) ascending."""
    (pxk, pyk, p1k), (pxl, pyl, p1l), (pxm, pym, p1m) = rows
    t0 = _polysub(_polymul(pyl, p1m), _polymul(pym, p1l))  # deg 7
    t1 = _polysub(_polymul(pxl, p1m), _polymul(pxm, p1l))  # deg 7
    t2 = _polysub(_polymul(pxl, pym), _polymul(pxm, pyl))  # deg 6
    det = _polysub(_polysub(_polymul(pxk, t0), _polymul(pyk, t1)), [])
    det = [c for c in det]
    t2k = _polymul(p1k, t2)
    n = max(len(det), len(t2k))
    out = []
    for i in range(n):
        a = det[i] if i < len(det) else None
        b = t2k[i] if i < len(t2k) else None
        out.append(b if a is None else (a if b is None else a + b))
    # pad to exactly 11 coefficients
    while len(out) < 11:
        out.append(jnp.zeros_like(out[0]))
    return jnp.stack(out[:11], axis=-1)


def _durand_kerner(coeffs: jnp.ndarray, iters: int = 60):
    """All 10 roots of (..., 11) ascending-coefficient polynomials.

    Fixed-iteration Durand-Kerner with complex arithmetic as (re, im)
    float pairs — batched, branch-free, TPU-safe. Near-zero leading
    coefficients (true degree < 10) produce far-away spurious roots whose
    candidates simply score no inliers. Returns (re, im): (..., 10).
    """
    scale = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)
    c = coeffs / jnp.maximum(scale, _TINY)
    lead = c[..., 10]
    # a tiny leading coefficient means the true degree is < 10; clamping it
    # keeps the monic coefficients <= 1e4 so nothing downstream overflows
    # (the resulting far-out spurious roots are discarded by the caller)
    lead_safe = jnp.where(
        jnp.abs(lead) > 1e-4, lead, jnp.where(lead >= 0, 1e-4, -1e-4)
    )
    c = c / lead_safe[..., None]  # monic, ascending

    # initial roots on a circle of radius 1 + max|c_i| (Cauchy bound-ish),
    # capped: f32 can't survive the 9-fold difference products beyond ~32,
    # and essential-matrix roots of interest are O(1) in the null basis
    r0 = jnp.minimum(1.0 + jnp.max(jnp.abs(c[..., :10]), axis=-1), 16.0)
    k = jnp.arange(10, dtype=coeffs.dtype)
    theta = 2.0 * jnp.pi * k / 10.0 + 0.37
    zre = r0[..., None] * jnp.cos(theta)
    zim = r0[..., None] * jnp.sin(theta)

    def horner(zre, zim):
        pre = jnp.ones_like(zre)  # monic leading coefficient
        pim = jnp.zeros_like(zim)
        for i in range(9, -1, -1):
            pre, pim = (
                pre * zre - pim * zim + c[..., i][..., None],
                pre * zim + pim * zre,
            )
        return pre, pim

    def body(_, zz):
        zre, zim = zz
        pre, pim = horner(zre, zim)
        # denom_i = prod_{j != i} (z_i - z_j)
        dre = zre[..., :, None] - zre[..., None, :]
        dim = zim[..., :, None] - zim[..., None, :]
        eye = jnp.eye(10, dtype=zre.dtype)
        dre = dre * (1.0 - eye) + eye
        dim = dim * (1.0 - eye)
        qre = jnp.ones_like(zre)
        qim = jnp.zeros_like(zim)
        for j in range(10):
            qre, qim = (
                qre * dre[..., :, j] - qim * dim[..., :, j],
                qre * dim[..., :, j] + qim * dre[..., :, j],
            )
        # w = p / q  (complex divide, guarded)
        q2 = jnp.maximum(qre * qre + qim * qim, _TINY)
        wre = (pre * qre + pim * qim) / q2
        wim = (pim * qre - pre * qim) / q2
        # clamp the update so one bad denominator can't fling a root to inf
        wmag = jnp.sqrt(wre * wre + wim * wim)
        lim = 2.0 * (1.0 + r0[..., None])
        f = jnp.where(wmag > lim, lim / jnp.maximum(wmag, _TINY), 1.0)
        zre = zre - f * wre
        zim = zim - f * wim
        # hard magnitude cap: keeps the difference products finite in f32
        zmag = jnp.sqrt(zre * zre + zim * zim)
        g = jnp.where(zmag > 32.0, 32.0 / jnp.maximum(zmag, _TINY), 1.0)
        return zre * g, zim * g

    zre, zim = jax.lax.fori_loop(0, iters, body, (zre, zim))
    # NaN guard (overflow escapes despite the caps): park at 0 with a huge
    # imaginary part so the caller's real-root test rejects them
    bad = ~(jnp.isfinite(zre) & jnp.isfinite(zim))
    zre = jnp.where(bad, 0.0, zre)
    zim = jnp.where(bad, 1e6, zim)
    return zre, zim


def _polyval_list(p: list, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate ascending-coefficient poly (list of (...,) arrays) at
    z: (..., R) — returns (..., R)."""
    out = jnp.broadcast_to(p[-1][..., None], p[-1].shape + z.shape[-1:])
    for c in reversed(p[:-1]):
        out = out * z + c[..., None]
    return out


def _mono20_and_jac(x, y, z):
    """The 20-monomial vector m(x,y,z) and its Jacobian wrt (x,y,z).

    x, y, z: (...,) arrays. Returns (m: (..., 20), J: (..., 20, 3)).
    """
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)

    def powv(v, k):
        if k <= 0:
            return ones
        p = v
        for _ in range(k - 1):
            p = p * v
        return p

    m, J = [], []
    for (i, j, k) in _MONOMIALS:
        xi, yj, zk = powv(x, i), powv(y, j), powv(z, k)
        m.append(xi * yj * zk)
        dx = i * powv(x, i - 1) * yj * zk if i > 0 else zeros
        dy = j * xi * powv(y, j - 1) * zk if j > 0 else zeros
        dz = k * xi * yj * powv(z, k - 1) if k > 0 else zeros
        J.append(jnp.stack([dx, dy, dz], axis=-1))
    return jnp.stack(m, axis=-1), jnp.stack(J, axis=-2)


def _polish_xyz(A, x, y, z, iters: int = 3):
    """Damped GN refinement of candidate (x, y, z) on the exact constraint
    system A (..., 10, 20): minimizes ||A m(x,y,z)||² directly, absorbing
    the f32 round-off of the elimination + root-finding chain.

    x, y, z: (..., R) candidates per batch element of A. Returns refined
    (x, y, z).
    """
    from visualodometry_tpu.geometry.linalg import solve_psd_small

    for _ in range(iters):
        m, Jm = _mono20_and_jac(x, y, z)  # (..., R, 20), (..., R, 20, 3)
        r = jnp.einsum("...cm,...rm->...rc", A, m, precision="highest")
        J = jnp.einsum("...cm,...rmv->...rcv", A, Jm, precision="highest")
        JtJ = jnp.einsum("...rcv,...rcw->...rvw", J, J, precision="highest")
        Jtr = jnp.einsum("...rcv,...rc->...rv", J, r, precision="highest")
        lam = 1e-6 * jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None, None] / 3.0
        JtJ = JtJ + (lam + 1e-12) * jnp.eye(3, dtype=JtJ.dtype)
        delta = solve_psd_small(JtJ, Jtr)
        x = x - delta[..., 0]
        y = y - delta[..., 1]
        z = z - delta[..., 2]
    return x, y, z


def five_point_candidates(
    x0: jnp.ndarray, x1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Essential-matrix candidates for batched minimal samples.

    x0, x1: (H, 5, 2) normalized coordinates. Returns (E, valid):
    E (H, 10, 3, 3) candidates on the essential manifold and a (H, 10)
    validity mask (near-real roots with a usable back-substitution).
    """
    dtype = x0.dtype
    a, b = x0[..., 0], x0[..., 1]
    c, d = x1[..., 0], x1[..., 1]
    one = jnp.ones_like(a)
    rows = jnp.stack([c * a, c * b, c, d * a, d * b, d, a, b, one], axis=-1)

    AtA = jnp.einsum("...ni,...nj->...ij", rows, rows, precision="highest")
    Ebasis = null_basis(AtA, 4)  # (H, 9, 4): columns E1..E4

    A = _constraint_rows(Ebasis)  # (H, 10, 20)
    B = _gauss_jordan_tail(A)  # (H, 10, 10)
    prows = _action_polys(B)
    det10 = _det_poly(prows)  # (H, 11)
    zre, zim = _durand_kerner(det10)  # (H, 10) each

    # near-real roots only; generous tolerance — f32 Durand-Kerner keeps
    # genuinely real roots within ~1e-3, spurious candidates just lose RANSAC
    real_ok = jnp.abs(zim) <= 0.02 * (1.0 + jnp.abs(zre))

    # back-substitute: B(z) @ (x, y, 1)^T = 0
    (pxk, pyk, p1k), (pxl, pyl, p1l), (pxm, pym, p1m) = prows
    z = zre
    Brows = [
        jnp.stack(
            [_polyval_list(px, z), _polyval_list(py, z), _polyval_list(p1, z)],
            axis=-1,
        )
        for px, py, p1 in ((pxk, pyk, p1k), (pxl, pyl, p1l), (pxm, pym, p1m))
    ]  # 3 x (H, 10, 3)
    c01 = jnp.cross(Brows[0], Brows[1])
    c02 = jnp.cross(Brows[0], Brows[2])
    c12 = jnp.cross(Brows[1], Brows[2])
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    v = jnp.where((n02 >= n12)[..., None], c02, c12)
    nv = jnp.maximum(n02, n12)
    v = jnp.where((n01 >= nv)[..., None], c01, v)
    nv = jnp.maximum(n01, nv)
    vnorm = jnp.sqrt(jnp.maximum(nv, _TINY))
    w = v[..., 2]
    w_ok = jnp.abs(w) > 1e-6 * vnorm
    w_safe = jnp.where(w_ok, w, 1.0)
    x = v[..., 0] / w_safe
    y = v[..., 1] / w_safe

    # GN polish on the exact constraint system: the elimination and the
    # f32 root finding leave candidates slightly off the algebraic variety;
    # three damped Newton steps pull them back to ~machine precision
    x, y, z = _polish_xyz(A, x, y, z)

    Eb = Ebasis.reshape(Ebasis.shape[:-2] + (3, 3, 4))  # (H, 3, 3, 4)
    E = (
        x[..., None, None] * Eb[..., None, :, :, 0]
        + y[..., None, None] * Eb[..., None, :, :, 1]
        + z[..., None, None] * Eb[..., None, :, :, 2]
        + Eb[..., None, :, :, 3]
    )  # (H, 10, 3, 3)

    # project onto the essential manifold (exact in f32 terms; the minimal
    # solution satisfies the constraints only up to solver round-off)
    U, _, Vt = svd3(E)
    s_proj = jnp.array([1.0, 1.0, 0.0], dtype)
    E = jnp.einsum("...ij,j,...jk->...ik", U, s_proj, Vt, precision="highest")

    return E, real_ok & w_ok
