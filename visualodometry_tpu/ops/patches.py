"""Per-keypoint patch extraction: one DMA per keypoint instead of
hundreds of random gathers.

SIFT orientation + descriptor sampling (frontend/sift.py) reads ~512
scattered taps per keypoint from the per-octave gradient field. As XLA
gathers those are latency-bound row fetches from HBM (the dominant cost
of the extraction stage, see RESULTS.md). This kernel instead DMAs one
contiguous (C, P, P) window per keypoint — every tap both stages will
ever read lives inside that window — so the downstream sampling becomes
dense math over (K, C, P, P) patches (see frontend/sift.py's patch
path), and the scattered-access problem is reduced to K sequential DMA
descriptors.

Replaces the hot half of the `cv2.SIFT` pixel walk (reference:
src/modules/frontend.py:55; N1 in SURVEY.md §2.3) with a TPU-shaped
access pattern. The kernel itself does no arithmetic: it is a scalar-
prefetched scatter-read (grid over keypoint groups, `group` DMAs in
flight per program so descriptor-issue latency overlaps the transfers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(group: int, patch: int, lvl_ref, y0_ref, x0_ref, field_ref, out_ref, sems):
    i = pl.program_id(0)
    dmas = []
    for g in range(group):
        k = i * group + g
        dma = pltpu.make_async_copy(
            field_ref.at[
                lvl_ref[k], :, pl.ds(y0_ref[k], patch), pl.ds(x0_ref[k], patch)
            ],
            out_ref.at[g],
            sems.at[g],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


@functools.partial(
    jax.jit, static_argnames=("patch", "group", "interpret")
)
def extract_patches(
    field: jnp.ndarray,
    lvl: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    patch: int,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather K windows field[lvl[k], :, y0[k]:y0[k]+P, x0[k]:x0[k]+P].

    field: (L, C, H, W); lvl/y0/x0: (K,) int32 with 0 <= y0 <= H-P,
    0 <= x0 <= W-P (callers clamp). Returns (K, C, P, P) in field.dtype.
    K must be a multiple of `group`.
    """
    L, C, H, W = field.shape
    K = lvl.shape[0]
    assert K % group == 0, (K, group)
    assert H >= patch and W >= patch, (H, W, patch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (group, C, patch, patch),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
    )
    return pl.pallas_call(
        functools.partial(_patch_kernel, group, patch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, C, patch, patch), field.dtype),
        interpret=interpret,
    )(
        lvl.astype(jnp.int32),
        y0.astype(jnp.int32),
        x0.astype(jnp.int32),
        field,
    )
