"""Per-keypoint patch extraction: one DMA per keypoint instead of
hundreds of random gathers.

SIFT orientation + descriptor sampling (frontend/sift.py) reads ~512
scattered taps per keypoint from the per-octave gradient field. As XLA
gathers those are latency-bound row fetches from HBM (the dominant cost
of the extraction stage, see RESULTS.md). This kernel instead DMAs one
contiguous window per keypoint — every tap both stages will ever read
lives inside that window — so the downstream sampling becomes dense
math over (K, Py, Px) patches (see frontend/sift.py's patch path), and
the scattered-access problem is reduced to K sequential DMA
descriptors.

Replaces the hot half of the `cv2.SIFT` pixel walk (reference:
src/modules/frontend.py:55; N1 in SURVEY.md §2.3) with a TPU-shaped
access pattern.

Mosaic constrains dynamic window origins to the (8, 128) tile grid
(sublane offsets must be multiples of 8, lane offsets and lane slice
sizes multiples of 128), so arbitrary keypoint positions can't be
sliced directly. The kernel therefore:
  - takes the row origin aligned DOWN to a multiple of 8 (the caller
    compensates with a patch 8 rows taller);
  - DMAs a 128-aligned, `patch_x + 128`-wide lane window into VMEM
    scratch, then shifts it into place with `tpu.dynamic_rotate` and
    writes the statically-sliced `patch_x` window out. Rotate only
    exists for 32-bit data, which is why the field arrives as int32
    (the caller packs the (gx, gy) bf16 pair into one word — a free
    bitcast that also halves DMA descriptor count vs two planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(
    group: int,
    patch_y: int,
    patch_x: int,
    wide_x: int,
    lvl_ref,
    y0_ref,
    xa_ref,
    xr_ref,
    field_ref,
    out_ref,
    scratch,
    sems,
):
    i = pl.program_id(0)
    dmas = []
    for g in range(group):
        k = i * group + g
        # alignment hints let Mosaic prove the offsets sit on the tile
        # grid (the caller guarantees it — see extract_patches)
        y0 = pl.multiple_of(y0_ref[k], 8)
        xa = pl.multiple_of(xa_ref[k], 128)
        dma = pltpu.make_async_copy(
            field_ref.at[lvl_ref[k], pl.ds(y0, patch_y), pl.ds(xa, wide_x)],
            scratch.at[g],
            sems.at[g],
        )
        dma.start()
        dmas.append(dma)
    for g in range(group):
        dmas[g].wait()
        k = i * group + g
        # shift the true window origin to lane 0, then slice statically
        rolled = pltpu.roll(scratch[g], -xr_ref[k], axis=1)
        out_ref[g] = rolled[:, :patch_x]


@functools.partial(
    jax.jit, static_argnames=("patch_y", "patch_x", "group", "interpret")
)
def extract_patches(
    field: jnp.ndarray,
    lvl: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    patch_y: int,
    patch_x: int,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather K windows field[lvl[k], y0[k]:y0[k]+Py, x0[k]:x0[k]+Px].

    field: (L, H, W) int32 (packed data, e.g. two bf16 gradient
    channels per word); lvl/y0/x0: (K,) int32 with 0 <= y0 <= H-Py,
    0 <= x0 <= W-Px (callers clamp). y0 must be a multiple of 8
    (callers align the origin down and use a patch tall enough to
    still cover every tap — frontend/sift.py:_patch_origins). x0 may
    be arbitrary; the kernel over-fetches a 128-aligned window
    (`wide_x` lanes, the next 128-multiple that always covers) and
    rotates the target window into place. W must be a multiple of 128
    with W >= wide_x (256 for patch_x = 64) — otherwise the clamp
    `min(x0 & ~127, W - wide_x)` lands off the lane-tile grid and the
    kernel's `multiple_of` hint would assert a falsehood (callers pad
    the field: frontend/sift.py:_pack_gradients_planar). Returns
    (K, Py, Px) int32. K must be a multiple of `group`.
    """
    L, H, W = field.shape
    K = lvl.shape[0]
    # smallest 128-multiple window that covers patch_x lanes at any
    # origin once the origin is aligned down (xr <= 127)
    wide_x = ((patch_x + 127) // 128) * 128 + 128
    assert K % group == 0, (K, group)
    assert H >= patch_y and W >= wide_x, (H, W, patch_y, wide_x)
    # both alignment hints below must be provable: W % 128 == 0 makes
    # the W - wide_x clamp 128-aligned; callers own the y0 contract
    assert W % 128 == 0, f"field W={W} must be a multiple of 128"

    x0 = x0.astype(jnp.int32)
    xa = jnp.minimum(x0 & ~127, W - wide_x)  # 128-aligned, window fits
    xr = x0 - xa  # in [0, 255]: target window sits inside the wide one

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(K // group,),
        # the field stays in HBM (under pl.ANY Mosaic may pull the
        # whole multi-MB field into VMEM when it fits)
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (group, patch_y, patch_x),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((group, patch_y, wide_x), field.dtype),
            pltpu.SemaphoreType.DMA((group,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_patch_kernel, group, patch_y, patch_x, wide_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, patch_y, patch_x), field.dtype),
        interpret=interpret,
    )(
        lvl.astype(jnp.int32),
        y0.astype(jnp.int32),
        xa,
        xr,
        field,
    )
