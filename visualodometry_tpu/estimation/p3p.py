"""Batched P3P minimal solver (Grunert), TPU-native.

cv2.solvePnPRansac's hypothesis generator is a P3P/EPnP-class MINIMAL
solver (reference: src/modules/vo.py:135-141 delegates to it); the
engine's r1-r4 hypotheses came from a 6-point DLT, whose least-squares
fit amplifies pixel noise into every hypothesis. P3P is algebraically
exact on its 3 points — hypothesis quality is bounded by keypoint
noise alone, which matters exactly in the strict-gate fast-flow regime
where the 6-point pool was measured to degenerate (RESULTS r4,
kitti_gates diagnosis).

Formulation (Grunert, via a resultant that never needs symbolic
expansion): with unit bearings f1,f2,f3 and world points X1,X2,X3,
set u = d2/d1, v = d3/d1. The two law-of-cosines ratios give two
MONIC quadratics in u whose coefficients are quadratic in v:

  Q1(u) = u^2 - 2 cos(gamma) u + (1 - B w(v))      B = |X1-X2|'^2
  Q2(u) = u^2 - 2 v cos(alpha) u + (v^2 - A w(v))  A = |X2-X3|'^2
  w(v)  = 1 + v^2 - 2 v cos(beta)        (primes: normalized by |X1-X3|^2)

Their resultant R(v) is a QUARTIC whose coefficients we recover by
evaluating R at five fixed abscissae and solving one constant 5x5
Vandermonde — every step is elementwise/batched, no polynomial algebra
in code. Roots via fixed-iteration Durand-Kerner (the same machinery
as the 5-point solver's degree-10 polynomial, estimation/fivepoint.py);
each real positive root yields distances and a rigid pose by 3-point
Kabsch. Up to 4 poses per sample — the RANSAC layer scores them all.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# abscissae for exact quartic coefficient recovery (constant, host-side)
_VS = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
_VANDER_INV = np.linalg.inv(np.vander(_VS, 5, increasing=True)).astype(
    np.float32
)  # coeffs c0..c4 from R(v) samples


def _resultant_monic_quadratics(b1, c1, b2, c2):
    """Resultant of u^2 + b1 u + c1 and u^2 + b2 u + c2 (elementwise)."""
    return (c1 - c2) ** 2 - (b2 - b1) * (b1 * c2 - b2 * c1)


def _durand_kerner4(coeffs, iters: int = 40):
    """Roots of a batched quartic c0 + c1 v + ... + c4 v^4.

    coeffs: (..., 5). Returns (..., 4) complex roots.
    """
    c4 = coeffs[..., 4:5]
    scale = jnp.where(jnp.abs(c4) > 1e-12, c4, 1e-12)
    mon = coeffs / scale  # monic
    # deterministic non-real starting points (standard DK seeding)
    seed = jnp.asarray(
        [0.4 + 0.9j, (0.4 + 0.9j) ** 2, (0.4 + 0.9j) ** 3, (0.4 + 0.9j) ** 4],
        jnp.complex64,
    )
    z = jnp.broadcast_to(seed, coeffs.shape[:-1] + (4,))

    def poly(z):
        r = jnp.zeros_like(z)
        for k in range(4, -1, -1):
            r = r * z + mon[..., k, None]
        return r

    for _ in range(iters):
        p = poly(z)
        for i in range(4):
            others = [z[..., j] for j in range(4) if j != i]
            denom = jnp.ones_like(z[..., i])
            for o in others:
                denom = denom * (z[..., i] - o)
            denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            z = z.at[..., i].add(-p[..., i] / denom)
            p = poly(z)
    return z


def _triad(P):
    """Orthonormal frame from 3 points (rows of P, shape (..., 3, 3)).

    Columns of the returned matrix are the Gram-Schmidt frame built from
    the two edge vectors P2-P1, P3-P1. Degenerate (collinear) triples
    yield non-finite entries, masked by the caller's isfinite check.
    """
    e1 = P[..., 1, :] - P[..., 0, :]
    e2 = P[..., 2, :] - P[..., 0, :]
    a1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
    r2 = e2 - jnp.sum(e2 * a1, -1, keepdims=True) * a1
    n2 = jnp.linalg.norm(r2, axis=-1, keepdims=True)
    a2 = r2 / jnp.where(n2 > 1e-9, n2, jnp.nan)  # collinear -> NaN -> masked
    a3 = jnp.cross(a1, a2)
    return jnp.stack([a1, a2, a3], axis=-1)  # columns


def _kabsch3(Pc, Xw):
    """Rigid T_cw from 3 camera-frame points and 3 world points.

    Pc, Xw: (..., 3, 3) rows = points. Returns R (..., 3, 3), t (..., 3)
    with Pc ~= R Xw + t.

    P3P's point triples are exactly congruent per hypothesis (distances
    come from an algebraic root), so the alignment is computed by triad
    composition R = F_c F_w^T — exact on congruent triples and, unlike an
    SVD of H (or eigh of H^T H, which squares the condition number),
    well-conditioned on elongated rank-2 geometries (ADVICE r4 #1).
    """
    Fc = _triad(Pc)
    Fw = _triad(Xw)
    R = jnp.einsum(
        "...ik,...jk->...ij", Fc, Fw, precision="highest"
    )  # Fc @ Fw^T
    t = Pc[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", R, Xw[..., 0, :], precision="highest"
    )
    return R, t


def p3p_grunert(X, xy):
    """Batched P3P: world points + normalized image points -> 4 poses.

    X: (H, 3, 3) world points (rows); xy: (H, 3, 2) normalized image
    coordinates. Returns (R (H, 4, 3, 3), t (H, 4, 3), ok (H, 4)):
    up to four camera-from-world poses per sample, masked by `ok`.
    """
    f = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # (H, 3, 3)
    X1, X2, X3 = X[:, 0], X[:, 1], X[:, 2]
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]

    b2 = jnp.sum((X1 - X3) ** 2, -1)  # |X1-X3|^2  (normalizer)
    a2 = jnp.sum((X2 - X3) ** 2, -1)
    c2 = jnp.sum((X1 - X2) ** 2, -1)
    nz = jnp.maximum(b2, 1e-12)
    A = a2 / nz
    B = c2 / nz
    ca = jnp.sum(f2 * f3, -1)  # cos(alpha)
    cb = jnp.sum(f1 * f3, -1)  # cos(beta)
    cg = jnp.sum(f1 * f2, -1)  # cos(gamma)

    # sample the resultant at the fixed abscissae
    samples = []
    for v0 in _VS:
        v = jnp.asarray(v0, jnp.float32)
        w = 1.0 + v * v - 2.0 * v * cb
        b1_, c1_ = -2.0 * cg, 1.0 - B * w
        b2_, c2_ = -2.0 * v * ca, v * v - A * w
        samples.append(
            _resultant_monic_quadratics(b1_, c1_, b2_, c2_)
        )
    S = jnp.stack(samples, -1)  # (H, 5)
    coeffs = jnp.einsum(
        "ck,hk->hc", jnp.asarray(_VANDER_INV), S, precision="highest"
    )  # (H, 5) c0..c4

    roots = _durand_kerner4(coeffs.astype(jnp.complex64))  # (H, 4)
    v = jnp.real(roots)

    # Newton polish against the resultant evaluated DIRECTLY (elementwise,
    # no Vandermonde round-trip): recovers the f32 accuracy the coefficient
    # recovery loses on ill-conditioned (elongated-triple) geometries.
    def res_at(v):
        w = 1.0 + v * v - 2.0 * v * cb[:, None]
        return _resultant_monic_quadratics(
            -2.0 * cg[:, None],
            1.0 - B[:, None] * w,
            -2.0 * v * ca[:, None],
            v * v - A[:, None] * w,
        )

    h = 1e-4 * (1.0 + jnp.abs(v))
    for _ in range(3):
        r0 = res_at(v)
        dr = (res_at(v + h) - res_at(v - h)) / (2.0 * h)
        stepv = r0 / jnp.where(jnp.abs(dr) > 1e-12, dr, 1e-12)
        v = v - jnp.clip(stepv, -0.1, 0.1)
    real = jnp.abs(jnp.imag(roots)) < 1e-3 * (1.0 + jnp.abs(v))
    pos = v > 1e-6

    w = 1.0 + v * v - 2.0 * v * cb[:, None]  # (H, 4)
    # common root of the two quadratics: u = (c1 - c2) / (b2 - b1)
    b1_, c1_ = -2.0 * cg[:, None], 1.0 - B[:, None] * w
    b2_, c2_ = -2.0 * v * ca[:, None], v * v - A[:, None] * w
    den = b2_ - b1_
    u = (c1_ - c2_) / jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)

    d1 = jnp.sqrt(nz[:, None] / jnp.maximum(w, 1e-12))
    ok = real & pos & (u > 1e-6) & (w > 1e-9)
    d2 = u * d1
    d3 = v * d1

    Pc = jnp.stack(
        [
            d1[..., None] * f1[:, None, :],
            d2[..., None] * f2[:, None, :],
            d3[..., None] * f3[:, None, :],
        ],
        axis=-2,
    )  # (H, 4, 3pts, 3)
    Xw = jnp.broadcast_to(X[:, None], Pc.shape)
    R, t = _kabsch3(Pc, Xw)
    ok &= jnp.isfinite(R).all((-1, -2)) & jnp.isfinite(t).all(-1)
    return R, t, ok
