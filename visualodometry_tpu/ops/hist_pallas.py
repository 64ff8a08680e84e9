"""Weighted histogram with the batch axis on the lanes (Pallas/TPU).

The SIFT orientation stage reduces (K, S) tap weights into (K, 36)
orientation histograms. Every XLA formulation of that scatter keeps the
36-bin axis as the minormost dimension — (K, S, 36) one-hots or
(K, 6, 6) factorized matmuls — which the (8, 128) tile layout pads ~4-21x
and lowers to tiny matmuls; measured 3.6-5.4 ms for one octave's
(2048, 256) histogram where the roofline is ~0.1 ms (see RESULTS.md r3).

This kernel instead keeps K on the 128-lane axis end-to-end: inputs
arrive transposed as (S, K), each grid step owns a (S, 128) block, and
the 36 bins are an unrolled compare-select-reduce over the sublane
axis — pure VPU work at full lane occupancy.

Replaces the hot half of `cv2.SIFT`'s orientation histogram voting
(reference: src/modules/frontend.py:27-32 delegates to OpenCV's
calcOrientationHist pixel loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _hist_kernel(nbins: int, w_ref, b_ref, out_ref):
    w = w_ref[...]  # (S, 128) f32
    b = b_ref[...]  # (S, 128) int32
    rows = [
        jnp.sum(jnp.where(b == k, w, 0.0), axis=0) for k in range(nbins)
    ]
    out_ref[...] = jnp.stack(rows, axis=0)  # (nbins, 128)


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def weighted_hist_lanes(
    w: jnp.ndarray,
    bins: jnp.ndarray,
    nbins: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """hist[b, k] = sum_s w[s, k] * [bins[s, k] == b].

    w: (S, K) float32, bins: (S, K) int32 in [0, nbins); K % 128 == 0.
    Returns (nbins, K) float32 — the batch axis stays on the lanes so
    downstream smoothing/argmax also runs lane-parallel.
    """
    S, K = w.shape
    assert K % 128 == 0, K
    return pl.pallas_call(
        functools.partial(_hist_kernel, nbins),
        grid=(K // 128,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, i)),
            pl.BlockSpec((S, 128), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((nbins, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nbins, K), w.dtype),
        interpret=interpret,
    )(w, bins.astype(jnp.int32))
