"""SIFT-style keypoint detector + descriptor, fixed-shape and jittable.

From-scratch TPU replacement for `cv2.SIFT_create().detectAndCompute`
(reference: src/modules/frontend.py:27-32,55; N1 in SURVEY.md §2.3). The
algorithm family is Lowe's scale-space DoG detector with gradient-
orientation-histogram descriptors; the *implementation* is a TPU-first
redesign:

- the scale-space and DoG stacks are XLA convolution pyramids
  (ops/pyramid.py);
- 3x3x3 extremum detection is a reduce_window over the whole DoG stack —
  every candidate in an octave is tested simultaneously;
- candidate selection is a per-octave top-K by |DoG response| into fixed
  keypoint slots with a validity mask (no dynamic-length keypoint lists);
- one-step quadratic subpixel refinement, orientation assignment, and the
  4x4x8 descriptor are batched gathers/scatter-adds over all keypoints at
  once — no per-keypoint host loops.

Deviations from OpenCV chosen for TPU shape discipline (capability is
preserved; exact keypoint sets differ, which only matters through the
matcher): upsampled -1 octave optional (cfg.sift_first_octave; ON for
long-horizon parity configs, off at the throughput operating point);
one orientation per keypoint unless cfg.sift_orientation_peaks > 1;
fixed 16x16 descriptor sample grid instead of the radius-dependent
pixel walk.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.frontend.interface import Features
from visualodometry_tpu.ops.pyramid import build_pyramid

_NUM_BINS = 36
_DESC_GRID = 4  # 4x4 spatial bins
_DESC_BINS = 8  # orientation bins
_SAMPLES = 16  # 16x16 descriptor sample grid
_ORI_SAMPLES = 16  # 16x16 orientation sample grid. A 12x12 grid is
# ~0.5 ms/frame cheaper and looks harmless on the short bench fixture
# (seed-level ATE even improves), but orientation jitter under real
# yaw is cumulative: the 256-frame S-curve fixture's pre-blackout
# drift DOUBLES at 12x12 (sim3 ATE 7.7 -> 15.0, r3 measurement) —
# descriptor rotation-invariance needs the precise histogram during
# turns. Keep parity with the descriptor grid.


class OctaveKeypoints(NamedTuple):
    xy: jnp.ndarray  # (K, 2) octave-pixel coords (x, y), subpixel
    scale_idx: jnp.ndarray  # (K,) int32 DoG layer index in [1, S]
    sigma_rel: jnp.ndarray  # (K,) octave-relative blur of the keypoint
    response: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,)


def _extrema_mask(dogs: jnp.ndarray, thr: float, edge_thresh: float):
    """Candidate mask + |response| over DoG layers 1..S.

    dogs: (S+2, H, W). Returns (mask, score): (S, H, W) each.
    """
    S2, H, W = dogs.shape
    # 3x3x3 max/min over (depth, h, w) with SAME padding in h/w, VALID
    # in s — as SEPARABLE shifted compares instead of reduce_window:
    # bit-identical output (max/min factorize over axes), but each pass
    # is 2 fused elementwise ops on the VPU instead of a 27-tap window
    # reduction (r4: detect stage 1.7 -> sub-ms on chip).
    def _sep3(a, op, fill):
        a = op(op(a[:-2], a[1:-1]), a[2:])  # s axis, VALID
        p = jnp.pad(a, ((0, 0), (1, 1), (0, 0)), constant_values=fill)
        a = op(op(p[:, :-2], p[:, 1:-1]), p[:, 2:])  # h axis, SAME
        p = jnp.pad(a, ((0, 0), (0, 0), (1, 1)), constant_values=fill)
        return op(op(p[:, :, :-2], p[:, :, 1:-1]), p[:, :, 2:])

    mx = _sep3(dogs, jnp.maximum, -jnp.inf)  # (S, H, W)
    mn = _sep3(dogs, jnp.minimum, jnp.inf)
    center = dogs[1:-1]
    is_max = (center >= mx) & (center > thr)
    is_min = (center <= mn) & (center < -thr)
    cand = is_max | is_min

    # edge rejection: 2x2 spatial Hessian ratio test on the center layer
    d = center
    dxx = jnp.roll(d, -1, 2) + jnp.roll(d, 1, 2) - 2 * d
    dyy = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
    dxy = 0.25 * (
        jnp.roll(jnp.roll(d, -1, 1), -1, 2)
        + jnp.roll(jnp.roll(d, 1, 1), 1, 2)
        - jnp.roll(jnp.roll(d, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(d, 1, 1), -1, 2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) * (r + 1.0) * det)
    cand = cand & edge_ok

    # exclude the image border (refinement/descriptor windows need margin)
    border = 8
    mask2d = jnp.zeros((H, W), bool)
    mask2d = mask2d.at[border : H - border, border : W - border].set(True)
    cand = cand & mask2d[None, :, :]
    return cand, jnp.abs(center)


def _refine_subpixel(dogs: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """One Newton step of the 3D quadratic fit at (s, y, x) (batched).

    dogs: (S+2, H, W); s is the DoG layer index (1..S). Returns
    (ds, dy, dx, refined_value), each (K,), offsets clipped to ±0.5.
    """

    # Gather the 27-neighborhoods as ONE (K, 27) offset lookup into the
    # flattened stack — a single vectorized gather beats K vmapped
    # dynamic_slices (or 27 small gathers) on TPU by an order of magnitude.
    S2, H, W = dogs.shape
    flat = dogs.reshape(-1)
    # clamp so padded/invalid candidates still index in-bounds (their
    # outputs are masked by the caller)
    s = jnp.clip(s, 1, S2 - 2)
    y = jnp.clip(y, 1, H - 2)
    x = jnp.clip(x, 1, W - 2)
    base = (s * H + y) * W + x  # (K,)
    offs = jnp.asarray(
        [
            (ds * H + dy) * W + dx
            for ds in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        base.dtype,
    )
    c = flat[base[:, None] + offs[None, :]].reshape(-1, 3, 3, 3)  # (K,3,3,3)
    # gradient (first central differences): order (s, y, x)
    g = jnp.stack(
        [
            0.5 * (c[:, 2, 1, 1] - c[:, 0, 1, 1]),
            0.5 * (c[:, 1, 2, 1] - c[:, 1, 0, 1]),
            0.5 * (c[:, 1, 1, 2] - c[:, 1, 1, 0]),
        ],
        axis=-1,
    )
    v = c[:, 1, 1, 1]
    dss = c[:, 2, 1, 1] + c[:, 0, 1, 1] - 2 * v
    dyy = c[:, 1, 2, 1] + c[:, 1, 0, 1] - 2 * v
    dxx = c[:, 1, 1, 2] + c[:, 1, 1, 0] - 2 * v
    dsy = 0.25 * (c[:, 2, 2, 1] - c[:, 2, 0, 1] - c[:, 0, 2, 1] + c[:, 0, 0, 1])
    dsx = 0.25 * (c[:, 2, 1, 2] - c[:, 2, 1, 0] - c[:, 0, 1, 2] + c[:, 0, 1, 0])
    dyx = 0.25 * (c[:, 1, 2, 2] - c[:, 1, 2, 0] - c[:, 1, 0, 2] + c[:, 1, 0, 0])
    # Closed-form symmetric 3x3 solve (adjugate / Cramer). A batched
    # `jnp.linalg.solve` of (K, 3, 3) lowers to a serialized LU on TPU and
    # cost ~18 ms at K=2048; the adjugate is pure VPU arithmetic (~0 ms).
    a = dss + 1e-6
    d = dyy + 1e-6
    f = dxx + 1e-6
    b, cc, e = dsy, dsx, dyx
    A = d * f - e * e
    B = cc * e - b * f
    C = b * e - cc * d
    D = a * f - cc * cc
    E = b * cc - a * e
    F = a * d - b * b
    det = a * A + b * B + cc * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    g0, g1, g2 = -g[:, 0], -g[:, 1], -g[:, 2]
    offset = jnp.stack(
        [
            (A * g0 + B * g1 + C * g2) * inv_det,
            (B * g0 + D * g1 + E * g2) * inv_det,
            (C * g0 + E * g1 + F * g2) * inv_det,
        ],
        axis=-1,
    )  # (K, 3)
    offset = jnp.clip(offset, -0.5, 0.5)
    refined = v + 0.5 * jnp.sum(g * offset, axis=-1)
    return offset[:, 0], offset[:, 1], offset[:, 2], refined


def _topk_hier(flat: jnp.ndarray, k: int, group: int = 512, t_cap: int = 64):
    """Hierarchical top-k over a long 1D score array.

    A direct lax.top_k over ~1M+ elements sorts the whole array; instead
    take top-t within groups of `group` elements (cheap row-wise top_k),
    then top-k over the G*t survivors. Exact whenever no group holds more
    than t of the true top-k — DoG extrema are strict 3x3x3 local maxima,
    so a 512-pixel span of one layer holding >64 of the global best is
    not a realizable image; in that regime this is a pure speedup.
    """
    n = flat.shape[0]
    t = min(t_cap, k)
    n_groups = -(-n // group)
    # fall back to direct top_k on small inputs or when the survivor
    # pool would be too shallow to hold the top-k
    if n <= 4 * group or k <= t or n_groups * t < 2 * k:
        return lax.top_k(flat, k)
    pad = (-n) % group
    f2 = jnp.pad(flat, (0, pad), constant_values=-jnp.inf).reshape(-1, group)
    ts, ti = lax.top_k(f2, t)  # (G, t)
    gi = (
        jnp.arange(f2.shape[0], dtype=jnp.int32)[:, None] * group + ti
    ).reshape(-1)
    fs, fj = lax.top_k(ts.reshape(-1), k)
    return fs, gi[fj]


def detect_octave(
    dogs: jnp.ndarray, cfg: VOConfig, k_octave: int
) -> OctaveKeypoints:
    """Fixed-K keypoint detection in one octave's DoG stack."""
    S = cfg.sift_scales_per_octave
    thr = 0.5 * cfg.sift_contrast_threshold / S
    cand, score = _extrema_mask(dogs, thr, cfg.sift_edge_threshold)
    Sc, H, W = score.shape
    flat = jnp.where(cand, score, -1.0).reshape(-1)
    if jax.default_backend() == "tpu":
        # hardware-binned approximate top-k (exact-equivalent whenever
        # the candidate count is under the budget, which covers every
        # operating point measured — candidates are strict 3x3x3
        # extrema; only the marginal tail can differ when
        # oversubscribed, where OpenCV's response truncation is equally
        # arbitrary). 0.7 ms/frame cheaper than the hierarchical
        # sort-based top-k at 1226x370 (scripts/profile_extract_stages).
        top_scores, top_idx = lax.approx_max_k(flat, k_octave)
    else:
        top_scores, top_idx = _topk_hier(flat, k_octave)
    valid = top_scores > 0
    s_idx = top_idx // (H * W) + 1  # DoG layer in [1, S]
    rem = top_idx % (H * W)
    y = rem // W
    x = rem % W

    ds, dy, dx, refined = _refine_subpixel(dogs, s_idx, y, x)
    # final contrast test on the interpolated value (OpenCV semantics)
    valid = valid & (jnp.abs(refined) * S >= cfg.sift_contrast_threshold)

    xf = x.astype(dogs.dtype) + dx
    yf = y.astype(dogs.dtype) + dy
    sf = s_idx.astype(dogs.dtype) + ds
    sigma_rel = cfg.sift_sigma * (2.0 ** (sf / S))
    return OctaveKeypoints(
        xy=jnp.stack([xf, yf], axis=-1),
        scale_idx=s_idx.astype(jnp.int32),
        sigma_rel=sigma_rel,
        response=jnp.abs(refined),
        valid=valid,
    )


def _gradients(stack: jnp.ndarray):
    """Central-difference gradients per level of (Lvl, H, W)."""
    gx = 0.5 * (jnp.roll(stack, -1, 2) - jnp.roll(stack, 1, 2))
    gy = 0.5 * (jnp.roll(stack, -1, 1) - jnp.roll(stack, 1, 1))
    return gx, gy


def _nearest_level(
    stack: jnp.ndarray, lvl: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-pixel sample of stack (Lvl, H, W) at per-keypoint levels.

    lvl: (K,), x/y: (K, M) float coords, one flat gather. Nearest (1 tap)
    instead of bilinear (4 taps): the sampled fields are Gaussian-blurred
    gradients, so sub-pixel interpolation buys almost nothing while the
    gather is ~5x cheaper on TPU (measured 4 ms vs 22 ms at 2048x256).
    """
    Lvl, H, W = stack.shape
    flat = stack.reshape(-1)
    xi = jnp.clip(jnp.round(x), 0.0, W - 1.0).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0.0, H - 1.0).astype(jnp.int32)
    idx = (lvl[:, None] * H + yi) * W + xi
    return flat[idx]


def _nearest_grad_pair(
    grad_packed: jnp.ndarray,
    H: int,
    W: int,
    lvl: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
):
    """Nearest-pixel (gx, gy) sample from a packed (Lvl*H*W, 2) field.

    One row-gather for both gradient components: gathering (gx, gy) rows
    halves the gather count vs two scalar gathers and measures ~3x
    faster at 2048x256 taps (the gather is latency-bound per row, not
    per byte).
    """
    xi = jnp.clip(jnp.round(x), 0.0, W - 1.0).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0.0, H - 1.0).astype(jnp.int32)
    idx = (lvl[:, None] * H + yi) * W + xi
    g2 = grad_packed[idx].astype(jnp.float32)  # (K, M, 2)
    return g2[..., 0], g2[..., 1]


def _pack_gradients(gauss: jnp.ndarray):
    """Per-level central-difference gradients, packed (Lvl*H*W, 2) bf16.

    bf16 halves the bytes the per-keypoint row gathers move (measured
    1.6x faster at 2048x256 taps); the precision loss is immaterial —
    gradients only feed magnitude/angle histograms and the descriptor is
    contrast-normalized twice downstream.
    """
    gx, gy = _gradients(gauss)
    return jnp.stack([gx, gy], axis=-1).astype(jnp.bfloat16).reshape(-1, 2)


def _pack_gradients_planar(gauss: jnp.ndarray, h_pad: int, w_pad: int):
    """Same gradient field as _pack_gradients, packed (Lvl, H_pad, W_pad) int32.

    This is the layout the patch-DMA path wants: the (gx, gy) bf16
    pair bitcast into ONE 32-bit word per pixel, so each keypoint is a
    single contiguous (Py, Px) window (ops/patches.py) — and the
    kernel's lane-rotate (32-bit only on this hardware) can shift
    unaligned windows into place. Values are bit-identical to the
    row-packed field after the matching bitcast back (_unpack_patches),
    so the two sampling paths read the same bf16 numbers.

    The field is zero-padded to (h_pad, w_pad) with h_pad % 8 == 0 and
    w_pad % 128 == 0 so every DMA window origin the kernel computes
    provably sits on the (8, 128) tile grid even when the true H/W do
    not (Mosaic's `multiple_of` hints must be facts, not wishes —
    real octave shapes like 613x306 are NOT tile-multiples). Padding
    pixels are never *sampled*: _make_patch_sampler clips tap
    coordinates to the true image extent before indexing.
    """
    gx, gy = _gradients(gauss)
    pair = jnp.stack(
        [gx.astype(jnp.bfloat16), gy.astype(jnp.bfloat16)], axis=-1
    )  # (L, H, W, 2)
    field = jax.lax.bitcast_convert_type(pair, jnp.int32)
    L, H, W = field.shape
    assert h_pad >= H and w_pad >= W and h_pad % 8 == 0 and w_pad % 128 == 0
    if h_pad != H or w_pad != W:
        field = jnp.pad(field, ((0, 0), (0, h_pad - H), (0, w_pad - W)))
    return field


def _unpack_patches(patches_i32: jnp.ndarray) -> jnp.ndarray:
    """(K, Py, Px) int32 -> (K, 2, Py, Px) bf16 gradient patches."""
    pair = jax.lax.bitcast_convert_type(patches_i32, jnp.bfloat16)
    return pair.transpose(0, 3, 1, 2)


def _patch_margin(cfg: VOConfig) -> int:
    """Upper bound (pixels) on any orientation/descriptor tap offset.

    Descriptor taps are the farthest: |R(gu,gv)|*hist_width with
    |gu|,|gv| <= 1.875 and hist_width = 3*sigma_rel, sigma_rel <=
    sigma0 * 2^((S+0.5)/S) (subpixel scale refinement caps at S+0.5).
    """
    S = cfg.sift_scales_per_octave
    sigma_max = cfg.sift_sigma * 2.0 ** ((S + 0.5) / S)
    desc_off = (2.0**0.5) * 1.875 * 3.0 * sigma_max
    lin_max = (_ORI_SAMPLES - 1) / _ORI_SAMPLES  # |du| <= this
    ori_off = 2.5 * 1.5 * sigma_max * lin_max
    return int(math.ceil(max(desc_off, ori_off)))


def _patch_origins(kps: OctaveKeypoints, H: int, W: int, h_pad: int, P: int):
    """Window origins so each keypoint sits (P/2-1, P/2) into its patch.

    Origins are clamped so the patch covers every tap the orientation/
    descriptor stages will read *after those taps are clipped to the
    true image extent* (tap offsets are bounded by _patch_margin <=
    P//2 - 1, and _make_patch_sampler clips to the image before
    indexing, so the patch only ever needs to contain in-image pixels
    near the keypoint).

    The row origin is additionally aligned DOWN to a multiple of 8 and
    the window made 8 rows taller (P_y = P + 8): the patch DMA's dynamic
    row offset must sit on the (8, 128) tile grid (ops/patches.py). The
    aligned clamp bound is h_pad - (P + 8) — a multiple of 8 because
    the FIELD is padded to h_pad % 8 == 0 (and P % 8 == 0), so the
    Mosaic alignment hint is a provable fact for every keypoint,
    including ones hugging the bottom edge of a non-tile-multiple
    image. Windows clamped there may extend into padding rows, which
    the sampler's image-extent clip guarantees are never read.
    """
    x0 = jnp.clip(
        jnp.floor(kps.xy[:, 0]).astype(jnp.int32) - (P // 2 - 1), 0, W - P
    )
    y0 = jnp.clip(
        jnp.floor(kps.xy[:, 1]).astype(jnp.int32) - (P // 2 - 1), 0, H - P
    )
    y0 = jnp.clip(y0 & ~7, 0, h_pad - (P + 8))
    return y0, x0


def _make_patch_sampler(
    patches: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    H: int,
    W: int,
):
    """Nearest-tap (gx, gy) sampler over per-keypoint gradient patches.

    patches: (K, 2, Py, Px) bf16 from ops/patches.extract_patches
    (Py = Px + 8: the row origin is tile-aligned, see _patch_origins).
    Tap coordinates are clipped to the TRUE image extent (H, W) first —
    exactly the clip the flat-gather path applies — and only then
    rebased into patch coordinates; _patch_origins guarantees the
    image-clipped tap always lies inside the patch, so padding pixels
    (the field is padded to tile multiples, see _pack_gradients_planar)
    are never selected. The per-tap selection is TWO one-hot
    contractions instead of a gather: T1 = Hy @ patch collapses the row
    choice into a well-shaped (M, Py) @ (Py, 2Px) MXU matmul per
    keypoint, and the column choice is an elementwise mask-reduce.
    One-hot selection of bf16 values is exact, so this returns
    bit-identical samples to the flat-gather path (_nearest_grad_pair)
    — verified in tests/test_sift_patches.py.
    """
    K, C, Py, Px = patches.shape
    # (K, y, c*x) so the row contraction leaves lanes = C*Px
    patcht = patches.transpose(0, 2, 1, 3).reshape(K, Py, C * Px)
    iota_y = jnp.arange(Py, dtype=jnp.int32)
    iota_x = jnp.arange(Px, dtype=jnp.int32)

    def sample(xs: jnp.ndarray, ys: jnp.ndarray):
        # the gather path's clip-to-image, verbatim (_nearest_grad_pair)
        xi_abs = jnp.clip(jnp.round(xs), 0.0, W - 1.0).astype(jnp.int32)
        yi_abs = jnp.clip(jnp.round(ys), 0.0, H - 1.0).astype(jnp.int32)
        # rebase into the patch; the residual clip can only bite for
        # invalid (masked) keypoints — real taps are in-patch by the
        # _patch_origins coverage argument
        xi = jnp.clip(xi_abs - x0[:, None], 0, Px - 1)
        yi = jnp.clip(yi_abs - y0[:, None], 0, Py - 1)
        hy = (yi[..., None] == iota_y).astype(patches.dtype)  # (K, M, Py)
        # keep the big (K, M, C*Px) intermediate in bf16: one-hot
        # selection has exactly one nonzero term per output, so bf16
        # accumulation is EXACT for bf16 patch values while halving the
        # dominant HBM traffic of the whole sampling stage (this
        # intermediate is ~270 MB/octave in f32 at the bench operating
        # point — the stage is bandwidth-bound, measured in RESULTS.md)
        t1 = jnp.einsum(
            "kmy,kyq->kmq", hy, patcht, preferred_element_type=jnp.bfloat16
        ).reshape(K, -1, C, Px)  # (K, M, 2, Px) bf16
        hx = (xi[..., None] == iota_x).astype(patches.dtype)  # (K, M, Px)
        g = jnp.einsum(
            "kmcp,kmp->kmc", t1, hx, preferred_element_type=jnp.float32
        )
        return g[..., 0], g[..., 1]

    def sample_separable(xs_col: jnp.ndarray, ys_row: jnp.ndarray):
        """Taps on a SEPARABLE (axis-aligned) grid: xs_col (K, Mx)
        column coordinates x ys_row (K, My) row coordinates.

        The orientation stage's sample grid is un-rotated, so its row
        choice is shared across each grid row and the column choice
        across each grid column: the selection work drops from
        My*Mx one-hot rows to My + Mx (~16x at the 16x16 grid), with
        values BIT-IDENTICAL to sample() on the outer-product grid
        (same per-axis round+clip, same one-hot selection of bf16).
        Returns (gx, gy), each (K, My*Mx) flattened row-major (y outer,
        x inner) — the meshgrid order the histogram weights use.
        """
        xi_abs = jnp.clip(jnp.round(xs_col), 0.0, W - 1.0).astype(jnp.int32)
        yi_abs = jnp.clip(jnp.round(ys_row), 0.0, H - 1.0).astype(jnp.int32)
        xi = jnp.clip(xi_abs - x0[:, None], 0, Px - 1)  # (K, Mx)
        yi = jnp.clip(yi_abs - y0[:, None], 0, Py - 1)  # (K, My)
        hy = (yi[..., None] == iota_y).astype(patches.dtype)  # (K, My, Py)
        rows = jnp.einsum(
            "kry,kyq->krq", hy, patcht, preferred_element_type=jnp.bfloat16
        ).reshape(K, -1, C, Px)  # (K, My, 2, Px)
        hx = (xi[..., None] == iota_x).astype(patches.dtype)  # (K, Mx, Px)
        g = jnp.einsum(
            "krcp,kxp->krxc", rows, hx, preferred_element_type=jnp.float32
        )  # (K, My, Mx, 2)
        g = g.reshape(K, -1, C)
        return g[..., 0], g[..., 1]

    sample.separable = sample_separable
    return sample


def compute_orientations(
    gauss: jnp.ndarray,
    kps: OctaveKeypoints,
    grad_packed: jnp.ndarray | None = None,
    sampler=None,
) -> jnp.ndarray:
    """Dominant gradient orientation per keypoint (radians), batched.

    Fixed 16x16 sample window scaled by 1.5*sigma_rel, 36-bin histogram
    with Gaussian weighting, circular smoothing, parabolic peak
    interpolation — the Lowe recipe at fixed shape.

    `sampler` (from _make_patch_sampler) replaces the flat-gather tap
    reads with per-keypoint patch contractions; results are identical.
    """
    hist = orientation_histogram(gauss, kps, grad_packed, sampler)
    theta1, _ = _hist_peak_angle(hist, jnp.argmax(hist, axis=-1))
    return theta1


def orientation_histogram(
    gauss: jnp.ndarray,
    kps: OctaveKeypoints,
    grad_packed: jnp.ndarray | None = None,
    sampler=None,
) -> jnp.ndarray:
    """Smoothed 36-bin gradient-orientation histogram per keypoint."""
    S_levels, H, W = gauss.shape
    if sampler is None and grad_packed is None:
        grad_packed = _pack_gradients(gauss)

    K = kps.xy.shape[0]
    # sample offsets: 8x8 grid spanning ±2.5 * (1.5 sigma)
    M = _ORI_SAMPLES
    lin = (jnp.arange(M) - (M - 1) / 2.0) / (M / 2.0)
    du, dv = jnp.meshgrid(lin, lin)  # each (M, M) in [-1, 1]
    du = du.reshape(-1)
    dv = dv.reshape(-1)  # (M*M,)

    sigma_w = 1.5 * kps.sigma_rel  # (K,)
    radius = 2.5 * sigma_w  # window half-extent
    xs = kps.xy[:, 0:1] + radius[:, None] * du[None, :]  # (K, 256)
    ys = kps.xy[:, 1:2] + radius[:, None] * dv[None, :]

    if sampler is not None and hasattr(sampler, "separable"):
        # the orientation grid is axis-aligned: per-axis selection
        # (separable one-hots) produces bit-identical taps at ~1/M the
        # selection cost (see _make_patch_sampler.sample_separable)
        gxs, gys = sampler.separable(
            kps.xy[:, 0:1] + radius[:, None] * lin[None, :],
            kps.xy[:, 1:2] + radius[:, None] * lin[None, :],
        )
    elif sampler is not None:
        gxs, gys = sampler(xs, ys)
    else:
        lvl = jnp.clip(kps.scale_idx, 0, S_levels - 1)
        gxs, gys = _nearest_grad_pair(grad_packed, H, W, lvl, xs, ys)

    mag = jnp.sqrt(gxs * gxs + gys * gys)
    ang = jnp.arctan2(gys, gxs)  # [-pi, pi]
    r2 = du * du + dv * dv  # normalized squared radius
    gw = jnp.exp(-r2[None, :] * (2.5**2) / (2.0 * 1.5**2))  # sigma-free form
    w = mag * gw

    bins = jnp.floor(
        (ang + jnp.pi) / (2 * jnp.pi) * _NUM_BINS
    ).astype(jnp.int32) % _NUM_BINS

    # histogram as a FACTORIZED one-hot contraction: one_hot(b, 36) ==
    # one_hot(b//6, 6) x one_hot(b%6, 6), so the scatter becomes a
    # batched (6, 256) @ (256, 6) matmul on the MXU and the materialized
    # one-hots are (K, 256, 6) each instead of (K, 256, 36)
    q = jax.nn.one_hot(bins // 6, 6, dtype=w.dtype)  # (K, 256, 6)
    r = jax.nn.one_hot(bins % 6, 6, dtype=w.dtype)  # (K, 256, 6)
    hist = jnp.einsum("ksi,ksj->kij", q * w[..., None], r).reshape(
        K, _NUM_BINS
    )
    # circular smoothing [1,4,6,4,1]/16, applied twice
    def smooth(h):
        return (
            6 * h
            + 4 * (jnp.roll(h, 1, -1) + jnp.roll(h, -1, -1))
            + (jnp.roll(h, 2, -1) + jnp.roll(h, -2, -1))
        ) / 16.0

    return smooth(smooth(hist))


def _hist_peak_angle(hist: jnp.ndarray, peak: jnp.ndarray):
    """Parabolic-interpolated angle of histogram bin `peak` (batched)."""
    hp = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % _NUM_BINS)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % _NUM_BINS)[:, None], -1)[:, 0]
    denom = hl - 2 * hp + hr
    delta = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0
    )
    bin_f = peak.astype(hist.dtype) + jnp.clip(delta, -0.5, 0.5)
    return (bin_f + 0.5) / _NUM_BINS * 2 * jnp.pi - jnp.pi, hp


def second_peak_orientation(hist: jnp.ndarray):
    """Top-2 orientation peaks from a smoothed histogram (peak splitting).

    OpenCV emits one keypoint per histogram peak >= 80% of the maximum
    (the reference delegates via cv2.SIFT, src/modules/frontend.py:27-32);
    this returns (theta1, theta2, has2) where theta2 is the secondary
    circular-local-max peak >= 0.8 * max (excluding the primary peak's
    two shoulder bins) and has2 marks keypoints that actually have one.
    The caller duplicates keypoint slots for secondaries (extract_sift
    with cfg.sift_orientation_peaks == 2).
    """
    peak1 = jnp.argmax(hist, axis=-1)
    theta1, h1 = _hist_peak_angle(hist, peak1)

    is_localmax = (hist >= jnp.roll(hist, 1, -1)) & (
        hist >= jnp.roll(hist, -1, -1)
    )
    idx = jnp.arange(_NUM_BINS, dtype=jnp.int32)
    # exclude the primary peak and its shoulder bins (circular)
    d = jnp.abs(idx[None, :] - peak1[:, None])
    d = jnp.minimum(d, _NUM_BINS - d)
    cand = is_localmax & (d > 1) & (hist >= 0.8 * h1[:, None])
    peak2 = jnp.argmax(jnp.where(cand, hist, -jnp.inf), axis=-1)
    has2 = jnp.any(cand, axis=-1)
    theta2, _ = _hist_peak_angle(hist, peak2)
    return theta1, theta2, has2


def compute_descriptors(
    gauss: jnp.ndarray,
    kps: OctaveKeypoints,
    theta: jnp.ndarray,
    grad_packed: jnp.ndarray | None = None,
    sampler=None,
) -> jnp.ndarray:
    """128-D descriptors: 4x4 spatial x 8 orientation bins, batched.

    16x16 rotated sample grid over a window of half-extent 1.5*sigma per
    spatial bin (Lowe's hist_width = 3 sigma); trilinear soft-assignment
    into the 4x4x8 histogram; L2 normalize, clip 0.2, renormalize.

    The trilinear scatter is computed as a batched outer-product
    contraction: the spatial bilinear weights form a dense hat-function
    tensor A (K, 256, 16) and the orientation linear weights a circular
    hat tensor B (K, 256, 8); desc = einsum(w*A, B) is one batched
    (16, 256) @ (256, 8) MXU matmul per keypoint. This is exactly equal
    to the 8-term trilinear scatter (a product of hats IS trilinear
    interpolation) at ~1/16th the materialized bytes.
    """
    S_levels, H, W = gauss.shape
    if sampler is None and grad_packed is None:
        grad_packed = _pack_gradients(gauss)

    K = kps.xy.shape[0]
    hist_width = 3.0 * kps.sigma_rel  # (K,) pixels per spatial bin
    # sample grid in bin units: 16x16 covering [-2, 2) bins
    lin = (jnp.arange(_SAMPLES) + 0.5) / _SAMPLES * _DESC_GRID - _DESC_GRID / 2
    gu, gv = jnp.meshgrid(lin, lin)  # (16, 16) in bin units
    gu = gu.reshape(-1)
    gv = gv.reshape(-1)  # (256,)

    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    # rotated pixel offsets
    ox = (cos_t[:, None] * gu[None, :] - sin_t[:, None] * gv[None, :]) * hist_width[:, None]
    oy = (sin_t[:, None] * gu[None, :] + cos_t[:, None] * gv[None, :]) * hist_width[:, None]
    xs = kps.xy[:, 0:1] + ox
    ys = kps.xy[:, 1:2] + oy

    if sampler is not None:
        gxs, gys = sampler(xs, ys)
    else:
        lvl = jnp.clip(kps.scale_idx, 0, S_levels - 1)
        gxs, gys = _nearest_grad_pair(grad_packed, H, W, lvl, xs, ys)

    mag = jnp.sqrt(gxs * gxs + gys * gys)
    ang = jnp.arctan2(gys, gxs) - theta[:, None]
    # gaussian weight over the window (sigma = half window in bin units)
    r2 = gu * gu + gv * gv
    gw = jnp.exp(-r2[None, :] / (2.0 * (_DESC_GRID / 2) ** 2))
    w = mag * gw  # (K, 256)

    # bin coordinates: spatial in [-0.5, 3.5], orientation in [0, 8)
    ub = gu + _DESC_GRID / 2 - 0.5  # (256,) — sample grid is kp-independent
    vb = gv + _DESC_GRID / 2 - 0.5
    # wrap into [0, 8): ang - theta spans [-2pi, 2pi]
    ob = jnp.mod((ang + jnp.pi) / (2 * jnp.pi) * _DESC_BINS, _DESC_BINS)

    # spatial bilinear weights as a dense hat product (256, 16); bins
    # outside [0, 4) get zero weight automatically (hat support)
    pu = jnp.arange(_DESC_GRID, dtype=w.dtype)
    hat_u = jnp.maximum(0.0, 1.0 - jnp.abs(ub[:, None] - pu[None, :]))
    hat_v = jnp.maximum(0.0, 1.0 - jnp.abs(vb[:, None] - pu[None, :]))
    A = (hat_v[:, :, None] * hat_u[:, None, :]).reshape(
        _SAMPLES * _SAMPLES, _DESC_GRID * _DESC_GRID
    )  # (256, 16), constant across keypoints

    # orientation linear weights with circular wrap (K, 256, 8)
    po = jnp.arange(_DESC_BINS, dtype=w.dtype)
    do = jnp.abs(ob[..., None] - po)  # (K, 256, 8)
    do = jnp.minimum(do, _DESC_BINS - do)
    B = jnp.maximum(0.0, 1.0 - do)

    # desc[k, p, o] = sum_s w[k,s] A[s,p] B[k,s,o] — one batched MXU
    # matmul per keypoint. Stays f32: a bf16-input variant (2x MXU)
    # was measured and REVERTED in r4 — the ~3e-3 descriptor
    # quantization looks harmless on the 32-frame fixture but costs
    # ~18% of tracked inliers on the 256-frame corridor and DOUBLES
    # its pre-blackout drift (4.29 -> 8.46 m, seed 0).
    desc = jnp.einsum(
        "ks,sp,kso->kpo", w, A, B
    ).reshape(K, _DESC_GRID * _DESC_GRID * _DESC_BINS)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    desc = jnp.minimum(desc, 0.2)
    norm2 = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm2, 1e-8)


def _octave_budgets(total: int, num_octaves: int) -> list[int]:
    """Split the keypoint budget over octaves, halving per octave."""
    budgets = []
    remaining = total
    for o in range(num_octaves):
        if o == num_octaves - 1:
            budgets.append(remaining)
        else:
            b = max(total // (2 ** (o + 1)), 1)
            budgets.append(b)
            remaining -= b
    return budgets


@partial(jax.jit, static_argnames=("cfg",))
def extract_sift(img: jnp.ndarray, cfg: VOConfig) -> Features:
    """(H, W) image -> fixed-shape SIFT Features.

    Accepts float in [0, 1] or uint8 in [0, 255] (normalized on device —
    uint8 ingest cuts host->device bytes 4x, which matters because frame
    upload is the only per-frame host boundary). The whole extractor —
    pyramid, detection, refinement, orientation, descriptors across all
    octaves — is one XLA program.
    """
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) * (1.0 / 255.0)
    img = img.astype(jnp.float32)
    S = cfg.sift_scales_per_octave
    gauss, dogs = build_pyramid(
        img,
        cfg.sift_num_octaves,
        S,
        sigma0=cfg.sift_sigma,
        first_octave=cfg.sift_first_octave,
    )
    return extract_sift_from_pyramid((tuple(gauss), tuple(dogs)), cfg)


def make_batched_extract_fn(cfg: VOConfig):
    """Chunk extractor: batched pyramids + per-frame detection/sampling.

    The Gaussian/DoG pyramids batch well across frames — the band
    matmuls get a free batch axis and the per-frame (C, H, W) einsums
    more than double their MXU occupancy (measured 2.44 -> 1.12
    ms/frame at 1226x370 x 8 frames on v5e). The rest of the extractor
    (top-k, patch DMA, per-keypoint contractions) degrades under vmap
    (r1 measurement), so it stays a lax.map over frames, consuming the
    prebuilt pyramids.
    """

    def extract_batch(imgs: jnp.ndarray) -> Features:
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) * (1.0 / 255.0)
        imgs = imgs.astype(jnp.float32)
        S = cfg.sift_scales_per_octave

        def pyr_one(im):
            gauss, dogs = build_pyramid(
                im,
                cfg.sift_num_octaves,
                S,
                sigma0=cfg.sift_sigma,
                first_octave=cfg.sift_first_octave,
            )
            return tuple(gauss), tuple(dogs)

        pyrs = jax.vmap(pyr_one)(imgs)
        return jax.lax.map(
            lambda p: extract_sift_from_pyramid(p, cfg), pyrs
        )

    return extract_batch


def extract_sift_from_pyramid(pyr_pair, cfg: VOConfig) -> Features:
    """Detection + orientation + descriptors over a prebuilt pyramid.

    pyr_pair: (gauss, dogs) tuples over octaves, as built by
    ops/pyramid.build_pyramid. Split out of extract_sift so chunk
    runners can batch the pyramid stage across frames
    (make_batched_extract_fn) while mapping this per-frame stage.
    """
    gauss, dogs = pyr_pair
    total = cfg.padded_keypoints
    peaks = getattr(cfg, "sift_orientation_peaks", 1)
    # peak splitting (OpenCV: one keypoint per orientation peak >= 80%
    # of max): each detected keypoint yields `peaks` slots, so the
    # detection budget shrinks to keep the total slot count — exactly
    # cv2's accounting, where duplicated-orientation keypoints count
    # toward nfeatures. Descriptor cost is per-slot, so this is
    # throughput-neutral at fixed padded_keypoints.
    budgets = _octave_budgets(total // peaks, cfg.sift_num_octaves)

    mode = getattr(cfg, "sift_sampling", "auto")
    on_tpu = jax.default_backend() == "tpu"
    want_patch = mode == "patch" or (mode == "auto" and on_tpu)
    P = -(-(2 * (_patch_margin(cfg) + 1)) // 8) * 8  # margin <= P//2 - 1

    all_xy, all_desc, all_valid = [], [], []
    for o in range(cfg.sift_num_octaves):
        kps = detect_octave(dogs[o], cfg, budgets[o])
        _, H_o, W_o = gauss[o].shape
        wide = ((P + 127) // 128) * 128 + 128  # kernel's DMA window
        # field padded to the (8, 128) tile grid so every DMA origin
        # the kernel computes is provably aligned (real octave shapes
        # like 613x306 are not tile multiples)
        h_pad = -(-H_o // 8) * 8
        w_pad = max(-(-W_o // 128) * 128, wide)
        fits = h_pad >= P + 8 and budgets[o] % 8 == 0
        if want_patch and fits:
            # patch-DMA sampling: one packed (P+8, P) window per
            # keypoint (ops/patches.py) feeds both stages;
            # bit-identical taps to the gather path (see
            # _make_patch_sampler)
            from visualodometry_tpu.ops.patches import extract_patches

            field = _pack_gradients_planar(gauss[o], h_pad, w_pad)
            y0, x0 = _patch_origins(kps, H_o, W_o, h_pad, P)
            lvl = jnp.clip(kps.scale_idx, 0, field.shape[0] - 1)
            patches = _unpack_patches(
                extract_patches(
                    field, lvl, y0, x0, patch_y=P + 8, patch_x=P,
                    interpret=not on_tpu,
                )
            )
            sampler = _make_patch_sampler(patches, y0, x0, H_o, W_o)
            grad_packed = None
        else:
            grad_packed = _pack_gradients(gauss[o])  # shared by both stages
            sampler = None
        hist = orientation_histogram(gauss[o], kps, grad_packed, sampler)
        if peaks == 1:
            theta, _ = _hist_peak_angle(hist, jnp.argmax(hist, axis=-1))
            thetas_valids = [(theta, kps.valid)]
        else:
            theta1, theta2, has2 = second_peak_orientation(hist)
            thetas_valids = [(theta1, kps.valid), (theta2, kps.valid & has2)]
        for theta, valid in thetas_valids:
            desc = compute_descriptors(
                gauss[o], kps, theta, grad_packed, sampler
            )
            # octave coords -> original image pixels
            all_xy.append(kps.xy * (2.0 ** (o + cfg.sift_first_octave)))
            all_desc.append(desc)
            all_valid.append(valid)

    return Features(
        kps=jnp.concatenate(all_xy, axis=0),
        desc=jnp.concatenate(all_desc, axis=0),
        valid=jnp.concatenate(all_valid, axis=0),
    )
