"""Pyramidal Lucas-Kanade (KLT) patch tracking, batched over keypoints.

Replacement for `cv2.calcOpticalFlowPyrLK` (SURVEY.md §2.3 N11 — the VO
project statement (PDF §4.1) recommends KLT tracking; the reference
snapshot matches descriptors instead, so this op is the low-latency
alternative correspondence source). Coarse-to-fine translation estimation
with a fixed iteration count per level; every keypoint's Gauss-Newton
update runs in the same batched program — patch gathers are flattened
bilinear samples, the 2x2 normal systems are solved in closed form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from visualodometry_tpu.ops.pyramid import blur_2d, downsample_2x


def build_klt_pyramid(img: jnp.ndarray, num_levels: int) -> list[jnp.ndarray]:
    """Standard tracking pyramid: blur + 2x downsample per level."""
    levels = [img]
    for _ in range(num_levels - 1):
        levels.append(downsample_2x(blur_2d(levels[-1], 1.0)))
    return levels


def _patch_offsets(radius: int):
    lin = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(lin, lin, indexing="ij")
    return dx.reshape(-1), dy.reshape(-1)  # (P,)


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _track_level(prev, nxt, pts_prev, flow, radius, iters, eps=1e-4):
    """Refine per-keypoint translation at one pyramid level."""
    dx_off, dy_off = _patch_offsets(radius)  # (P,)
    px = pts_prev[:, 0:1] + dx_off[None, :]  # (N, P)
    py = pts_prev[:, 1:2] + dy_off[None, :]

    # template patch + gradients from the previous frame (fixed per level)
    t = _bilinear(prev, px, py)
    gx = 0.5 * (_bilinear(prev, px + 1, py) - _bilinear(prev, px - 1, py))
    gy = 0.5 * (_bilinear(prev, px, py + 1) - _bilinear(prev, px, py - 1))

    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    invertible = det > 1e-6
    det_safe = jnp.where(invertible, det, 1.0)

    def body(_, flow):
        qx = px + flow[:, 0:1]
        qy = py + flow[:, 1:2]
        e = _bilinear(nxt, qx, qy) - t  # (N, P)
        bx = jnp.sum(gx * e, axis=1)
        by = jnp.sum(gy * e, axis=1)
        # solve [gxx gxy; gxy gyy] d = -b
        dx = -(gyy * bx - gxy * by) / det_safe
        dy = -(gxx * by - gxy * bx) / det_safe
        step = jnp.where(invertible[:, None], jnp.stack([dx, dy], -1), 0.0)
        return flow + step

    flow = jax.lax.fori_loop(0, iters, body, flow)
    return flow, invertible


# --------------------------------------------------------------------------
# Patch-DMA sampling path (TPU default)
#
# The gather path above reads every LK tap with XLA advanced indexing —
# ~40M latency-bound random HBM taps per frame pair at 4096 tracks,
# measured 1.58 fps end-to-end on the v5e chip. The TPU path below DMAs
# one contiguous window per keypoint per level (ops/patches.py, the same
# kernel the SIFT frontend uses) and turns every subsequent tap into
# dense separable bilinear-hat contractions over the patch: the LK tap
# grid is axis-aligned and shifts uniformly with the flow, so row/column
# hats factorize exactly like the SIFT orientation sampler, and a
# product of two linear hats IS bilinear interpolation.


def _patch_field(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) f32 -> (1, H8, W128) int32 bitcast field for extract_patches.

    Rows padded to a multiple of 8 and lanes to a multiple of 128
    (min 256) with edge replication, per the patch kernel's contract.
    """
    H, W = img.shape
    H8 = -(-H // 8) * 8
    W128 = max(-(-W // 128) * 128, 256)
    padded = jnp.pad(img, ((0, H8 - H), (0, W128 - W)), mode="edge")
    return jax.lax.bitcast_convert_type(padded, jnp.int32)[None]


def _hats(u: jnp.ndarray, n: int) -> jnp.ndarray:
    """(N, T) patch-coordinate taps -> (N, T, n) bilinear hat weights."""
    u = jnp.clip(u, 0.0, n - 1.001)
    iota = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - iota))


def _sample_sep(patches: jnp.ndarray, ux: jnp.ndarray, uy: jnp.ndarray):
    """Separable bilinear sampling: (N, Py, Px) x (N, Tx) x (N, Ty)
    -> (N, Ty, Tx) values at every (uy, ux) grid point."""
    hy = _hats(uy, patches.shape[1])  # (N, Ty, Py)
    rows = jnp.einsum("nrp,npx->nrx", hy, patches)
    hx = _hats(ux, patches.shape[2])  # (N, Tx, Px)
    return jnp.einsum("nrx,ncx->nrc", rows, hx)


def _sample_sep_shared(img: jnp.ndarray, ux: jnp.ndarray, uy: jnp.ndarray):
    """_sample_sep against ONE shared image (tiny pyramid levels whose
    whole extent is smaller than a patch): no per-keypoint windows, the
    row contraction runs against the (H, W) level directly."""
    hy = _hats(uy, img.shape[0])  # (N, Ty, H)
    rows = jnp.einsum("nrp,px->nrx", hy, img)
    hx = _hats(ux, img.shape[1])  # (N, Tx, W)
    return jnp.einsum("nrx,ncx->nrc", rows, hx)


def _track_level_patch(
    field_prev, field_next, H, W, pts_prev, flow, radius, iters,
    drift, interpret, eps=1e-4,
):
    """One pyramid level of LK on DMA'd patches.

    field_*: packed (1, H8, W128) int32 fields of this level.
    drift: max |flow change| accommodated inside the next-frame patch.
    Returns (flow, ok, t) with t the (N, T, T) template (reused by the
    caller for the final residual at level 0).
    """
    from visualodometry_tpu.ops.patches import extract_patches

    N = pts_prev.shape[0]
    r1 = radius + 2  # template tap span: +-(radius+1) taps, +1 bilinear
    PxT = -(-(2 * r1 + 1) // 8) * 8  # 16 at radius 4
    PyT = PxT + 8
    lvl = jnp.zeros((N,), jnp.int32)
    x, y = pts_prev[:, 0], pts_prev[:, 1]
    Hf, Wp = field_prev.shape[1], field_prev.shape[2]
    if Hf < PyT:
        # whole level smaller than a patch: sample it directly
        imgp = jax.lax.bitcast_convert_type(
            field_prev[0], jnp.float32
        )

        def sample_prev(axx, ayy):
            return _sample_sep_shared(imgp, axx, ayy)

    else:
        x0t = jnp.clip(
            jnp.floor(x).astype(jnp.int32) - r1, 0, Wp - PxT
        )
        y0t = jnp.clip(
            (jnp.floor(y).astype(jnp.int32) - r1) & ~7, 0, Hf - PyT
        )
        tpatch = jax.lax.bitcast_convert_type(
            extract_patches(
                field_prev, lvl, y0t, x0t, PyT, PxT,
                interpret=interpret,
            ),
            jnp.float32,
        )

        def sample_prev(axx, ayy):
            return _sample_sep(
                tpatch,
                axx - x0t[:, None].astype(jnp.float32),
                ayy - y0t[:, None].astype(jnp.float32),
            )

    lin = jnp.arange(-radius, radius + 1, dtype=jnp.float32)  # (T,)
    # clip taps to the true image extent FIRST (the gather path's edge
    # clamp), then rebase into the patch
    ax = jnp.clip(x[:, None] + lin, 0.0, W - 1.001)
    ay = jnp.clip(y[:, None] + lin, 0.0, H - 1.001)
    def cx(v):
        return jnp.clip(v, 0.0, W - 1.001)

    def cy(v):
        return jnp.clip(v, 0.0, H - 1.001)

    t = sample_prev(ax, ay)  # (N, T, T)
    gx = 0.5 * (sample_prev(cx(ax + 1), ay) - sample_prev(cx(ax - 1), ay))
    gy = 0.5 * (sample_prev(ax, cy(ay + 1)) - sample_prev(ax, cy(ay - 1)))

    gxx = jnp.sum(gx * gx, axis=(1, 2))
    gxy = jnp.sum(gx * gy, axis=(1, 2))
    gyy = jnp.sum(gy * gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    invertible = det > 1e-6
    det_safe = jnp.where(invertible, det, 1.0)

    # next-frame patch around the predicted position, wide enough for
    # +-drift of in-level refinement
    rN = radius + drift + 2
    PxN = -(-(2 * rN + 1) // 8) * 8
    PyN = PxN + 8
    if field_next.shape[1] < PyN:
        imgn = jax.lax.bitcast_convert_type(
            field_next[0], jnp.float32
        )

        def sample_next(axx, ayy):
            return _sample_sep_shared(imgn, axx, ayy)

    else:
        qx, qy = x + flow[:, 0], y + flow[:, 1]
        x0n = jnp.clip(
            jnp.floor(qx).astype(jnp.int32) - rN, 0, Wp - PxN
        )
        y0n = jnp.clip(
            (jnp.floor(qy).astype(jnp.int32) - rN) & ~7, 0,
            field_next.shape[1] - PyN,
        )
        npatch = jax.lax.bitcast_convert_type(
            extract_patches(
                field_next, lvl, y0n, x0n, PyN, PxN,
                interpret=interpret,
            ),
            jnp.float32,
        )

        def sample_next(axx, ayy):
            return _sample_sep(
                npatch,
                axx - x0n[:, None].astype(jnp.float32),
                ayy - y0n[:, None].astype(jnp.float32),
            )

    flow0 = flow

    def body(_, flow):
        aqx = cx(x[:, None] + lin + flow[:, 0:1])
        aqy = cy(y[:, None] + lin + flow[:, 1:2])
        e = sample_next(aqx, aqy) - t
        bx = jnp.sum(gx * e, axis=(1, 2))
        by = jnp.sum(gy * e, axis=(1, 2))
        dx = -(gyy * bx - gxy * by) / det_safe
        dy = -(gxx * by - gxy * bx) / det_safe
        step = jnp.where(
            invertible[:, None], jnp.stack([dx, dy], -1), 0.0
        )
        return flow + step

    flow = jax.lax.fori_loop(0, iters, body, flow)
    # refinement that left the patch's drift budget is untrusted
    ok = invertible & (
        jnp.max(jnp.abs(flow - flow0), axis=1) <= drift - 1.0
    )
    return flow, ok, (sample_next, t)


@partial(
    jax.jit,
    static_argnames=("num_levels", "radius", "iters", "sampling"),
)
def klt_track(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    kps: jnp.ndarray,
    valid: jnp.ndarray,
    num_levels: int = 3,
    radius: int = 4,
    iters: int = 10,
    max_residual: float = 0.04,
    sampling: str = "auto",
):
    """Track (N, 2) keypoints from img_prev to img_next.

    Returns (new_kps (N, 2), tracked (N,) bool). `tracked` requires an
    invertible structure tensor at the finest level, in-bounds result,
    and mean absolute patch residual below `max_residual` (images in
    [0, 1]). `sampling`: "gather" (XLA advanced indexing — CPU default),
    "patch" (patch-DMA + separable hat contractions — TPU default,
    ~400x fewer random HBM taps), or "auto".
    """
    if sampling == "auto":
        sampling = (
            "patch" if jax.default_backend() == "tpu" else "gather"
        )
    if sampling in ("patch", "patch_interpret"):
        return _klt_track_patch(
            img_prev, img_next, kps, valid, num_levels, radius, iters,
            max_residual, interpret=sampling == "patch_interpret",
        )
    pyr_prev = build_klt_pyramid(img_prev, num_levels)
    pyr_next = build_klt_pyramid(img_next, num_levels)

    flow = jnp.zeros_like(kps)
    ok = valid
    for lvl in range(num_levels - 1, -1, -1):
        s = 2.0**lvl
        pts_l = kps / s
        flow = flow / s
        flow, invertible = _track_level(
            pyr_prev[lvl], pyr_next[lvl], pts_l, flow, radius, iters
        )
        ok = ok & invertible
        flow = flow * s

    new_kps = kps + flow

    # final verification at full resolution
    dx_off, dy_off = _patch_offsets(radius)
    t = _bilinear(
        pyr_prev[0],
        kps[:, 0:1] + dx_off[None, :],
        kps[:, 1:2] + dy_off[None, :],
    )
    q = _bilinear(
        pyr_next[0],
        new_kps[:, 0:1] + dx_off[None, :],
        new_kps[:, 1:2] + dy_off[None, :],
    )
    residual = jnp.mean(jnp.abs(q - t), axis=1)
    H, W = img_prev.shape
    in_bounds = (
        (new_kps[:, 0] >= radius)
        & (new_kps[:, 0] < W - radius)
        & (new_kps[:, 1] >= radius)
        & (new_kps[:, 1] < H - radius)
    )
    tracked = ok & in_bounds & (residual < max_residual)
    return new_kps, tracked


# (gather path above; patch-DMA path below)


def _klt_track_patch(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    kps: jnp.ndarray,
    valid: jnp.ndarray,
    num_levels: int,
    radius: int,
    iters: int,
    max_residual: float,
    interpret: bool = False,
):
    """klt_track body on the patch-DMA sampling path (see klt_track)."""
    drift = 6  # in-level refinement budget inside the next-frame patch
    # the patch kernel groups 8 DMAs per grid step: pad the slot count
    n_in = kps.shape[0]
    n_pad = (-n_in) % 8
    if n_pad:
        kps = jnp.concatenate(
            [kps, jnp.full((n_pad, 2), 16.0, kps.dtype)], axis=0
        )
        valid = jnp.concatenate(
            [valid, jnp.zeros((n_pad,), bool)], axis=0
        )
    pyr_prev = build_klt_pyramid(img_prev, num_levels)
    pyr_next = build_klt_pyramid(img_next, num_levels)
    fields_p = [_patch_field(p) for p in pyr_prev]
    fields_n = [_patch_field(p) for p in pyr_next]

    flow = jnp.zeros_like(kps)
    ok = valid
    extras = None
    for lvl in range(num_levels - 1, -1, -1):
        s = 2.0**lvl
        pts_l = kps / s
        flow = flow / s
        Hl, Wl = pyr_prev[lvl].shape
        flow, lvl_ok, extras = _track_level_patch(
            fields_p[lvl], fields_n[lvl], Hl, Wl, pts_l, flow,
            radius, iters, drift, interpret,
        )
        ok = ok & lvl_ok
        flow = flow * s

    new_kps = kps + flow

    # final verification at full resolution, reusing the level-0
    # template and next-frame patch (the drift gate in `ok` guarantees
    # trusted flows stayed inside the patch)
    sample_next, t = extras
    H, W = img_prev.shape
    lin = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    aqx = jnp.clip(new_kps[:, 0:1] + lin, 0.0, W - 1.001)
    aqy = jnp.clip(new_kps[:, 1:2] + lin, 0.0, H - 1.001)
    q = sample_next(aqx, aqy)
    residual = jnp.mean(jnp.abs(q - t), axis=(1, 2))
    in_bounds = (
        (new_kps[:, 0] >= radius)
        & (new_kps[:, 0] < W - radius)
        & (new_kps[:, 1] >= radius)
        & (new_kps[:, 1] < H - radius)
    )
    tracked = ok & in_bounds & (residual < max_residual)
    return new_kps[:n_in], tracked[:n_in]
