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


@partial(jax.jit, static_argnames=("num_levels", "radius", "iters"))
def klt_track(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    kps: jnp.ndarray,
    valid: jnp.ndarray,
    num_levels: int = 3,
    radius: int = 4,
    iters: int = 10,
    max_residual: float = 0.04,
):
    """Track (N, 2) keypoints from img_prev to img_next.

    Returns (new_kps (N, 2), tracked (N,) bool). `tracked` requires an
    invertible structure tensor at the finest level, in-bounds result,
    and mean absolute patch residual below `max_residual` (images in
    [0, 1]).
    """
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
