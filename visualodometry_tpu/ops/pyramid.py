"""Gaussian scale-space and Difference-of-Gaussians pyramids.

Replaces the scale-space machinery inside `cv2.SIFT` (N1 in SURVEY.md
§2.3). Blurs are **banded matrix multiplications on the MXU**: a 1D
"edge"-padded convolution along an axis of length n is exactly a matmul
with an (n, n) band matrix, so one octave's full Gaussian stack is two
batched einsums (horizontal then vertical, one channel per target blur).

Why matmuls and not `conv_general_dilated`: measured on the v5e chip at
1226x370, the conv pyramid costs ~9 ms/frame AND is only bf16-accurate
(3.3e-3 max error vs a float64 oracle — XLA lowers small depthwise convs
through low-precision passes), while the band-matmul pyramid at
Precision.HIGH costs ~3 ms and is ~2e-6 accurate. Accuracy matters here:
the DoG contrast threshold is O(2.5e-3), the same order as the conv
path's error. The band matrices are precomputed host-side per static
image shape and cached.

All shapes are static functions of the input size; downsampling is a
stride-2 slice.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISION = lax.Precision.HIGH  # f32 err ~2e-6; HIGHEST ~6e-8 at 2x cost


def _full_kernel_np(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _band_matrix_np(n: int, kern: np.ndarray) -> np.ndarray:
    """(n, n) matrix B with (row_in @ B) == edge-padded 1D conv of row_in."""
    r = (len(kern) - 1) // 2
    B = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in range(-r, r + 1):
            j = min(max(i + t, 0), n - 1)
            B[j, i] += kern[t + r]
    return B


def gaussian_kernel_1d(sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Odd-length 1D Gaussian, radius ceil(3 sigma) (<0.3% truncated mass)."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    return jnp.asarray(_full_kernel_np(sigma, radius), dtype)


@lru_cache(maxsize=None)
def _blur_mats(h: int, w: int, sigma: float):
    # cache NUMPY arrays: caching jnp arrays would capture trace-local
    # constant tracers under jit and leak them across traces
    k = _full_kernel_np(sigma, max(1, int(math.ceil(3.0 * sigma))))
    return _band_matrix_np(h, k), _band_matrix_np(w, k)


def blur_2d(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W) with edge ("SAME") handling."""
    H, W = img.shape
    Bv, Bh = _blur_mats(H, W, float(sigma))
    # out = Bv^T @ img @ Bh  (B maps input index -> output index)
    return jnp.einsum(
        "hu,hw,wv->uv", Bv, img.astype(jnp.float32), Bh, precision=_PRECISION
    )


@lru_cache(maxsize=None)
def _octave_mats(h: int, w: int, scales: int, sigma0: float):
    """Per-level band matrices for one octave: (C, H, H) and (C, W, W).

    Level i of the stack has absolute blur sigma0 * 2^((i+1)/scales),
    produced DIRECTLY from the octave base (blur sigma0) in one hop —
    the classic incremental level-to-level recurrence is a CPU-cache
    trick that only serializes a TPU.
    """
    k = 2.0 ** (1.0 / scales)
    n_out = scales + 2
    sigmas = [
        math.sqrt(max((sigma0 * k ** (i + 1)) ** 2 - sigma0**2, 1e-8))
        for i in range(n_out)
    ]
    radius = max(1, int(math.ceil(3.0 * max(sigmas))))
    Bv = np.stack([_band_matrix_np(h, _full_kernel_np(s, radius)) for s in sigmas])
    Bh = np.stack([_band_matrix_np(w, _full_kernel_np(s, radius)) for s in sigmas])
    return Bv, Bh


def build_gaussian_octave(
    base: jnp.ndarray, sigma0: float, scales: int
) -> jnp.ndarray:
    """(scales+3, H, W) Gaussian stack for one octave (level 0 = base)."""
    H, W = base.shape
    Bv, Bh = _octave_mats(H, W, scales, float(sigma0))
    x = jnp.einsum("hw,cwv->chv", base, Bh, precision=_PRECISION)
    x = jnp.einsum("chw,chu->cuw", x, Bv, precision=_PRECISION)
    return jnp.concatenate([base[None], x], axis=0)


def downsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


# ---------------------------------------------------------------------------
# Pallas block-banded blur stack
#
# The dense band-matmul octave does W (resp. H) MACs per output pixel
# when the Gaussian support is only 9-31 taps — ~40x structural-zero
# waste on the MXU (measured ~0.34 ms/frame batched at 1226x370). A
# VPU shift-and-add variant was built first and measured SLOWER (0.42):
# unaligned lane slices cost a relayout copy per tap. The kernel below
# keeps the MXU but exploits the band structure *blockwise*:
#   - horizontal: each 128-lane output block depends on one 256-lane
#     input window, and because the band is shift-invariant the SAME
#     (256, C*128) matrix maps a window to all C channels' block — a
#     handful of small matmuls per row tile (256 MACs/pixel vs W=1226);
#   - vertical: one (TH, TH+2R) @ (TH+2R, W) matmul per channel
#     (TH+2R=64 MACs/pixel vs H=370).
# ~4x fewer FLOPs than the dense band matmul, one fused pass over a
# row tile held in VMEM. Status: OPT-IN (impl="pallas"), not the
# default — see the note in build_pyramid: measured FLOP-parity with
# the dense einsum and a long-horizon chaos sensitivity to its
# different summation order.


@lru_cache(maxsize=None)
def _stack_taps(scales: int, sigma0: float) -> tuple[tuple[float, ...], ...]:
    """Per-channel 1D taps for one octave — SAME shared stack-max
    radius as the band-matmul path (_octave_mats).

    Channel i has incremental blur sqrt((sigma0*k^(i+1))^2 - sigma0^2)
    applied to the octave base. An earlier per-channel-radius variant
    (radius ceil(3 sigma_c), <0.3% mass difference) was MEASURED and
    REVERTED: the ~5e-4 blur difference flipped marginal DoG extrema
    and cost the 1024-frame marathon 3 unexplained resets (segment ATE
    43 -> 61 m) where the matmul pyramid has none. The block-banded
    matmul cost does not depend on tap count, so matching the shared
    radius is free.
    """
    k = 2.0 ** (1.0 / scales)
    sigmas = [
        math.sqrt(max((sigma0 * k ** (i + 1)) ** 2 - sigma0**2, 1e-8))
        for i in range(scales + 2)
    ]
    radius = max(1, int(math.ceil(3.0 * max(sigmas))))
    return tuple(
        tuple(_full_kernel_np(s, radius).tolist()) for s in sigmas
    )


@lru_cache(maxsize=None)
def _block_band_mats(taps, TH: int, R: int):
    """Blockwise band matrices for one octave's separable blurs.

    Bh (256, C*128): maps a 256-lane input window (64-lane halo each
    side) to all C channels' 128-lane horizontal-blur block; the band
    is shift-invariant so one matrix serves every block. Requires
    per-channel radius <= 64.
    Bv (C, TH, TH+2R): per-channel vertical pass over a row tile.
    """
    C = len(taps)
    Bh = np.zeros((256, C * 128), np.float32)
    Bv = np.zeros((C, TH, TH + 2 * R), np.float32)
    for c, kern in enumerate(taps):
        r = (len(kern) - 1) // 2
        assert r <= 64, r
        for length in range(128):
            for t in range(-r, r + 1):
                Bh[64 + length + t, c * 128 + length] = kern[t + r]
        for ro in range(TH):
            for t in range(-r, r + 1):
                Bv[c, ro, R + ro + t] = kern[t + r]
    return Bh, Bv


def _blur_stack_kernel(
    C: int,
    TH: int,
    R: int,
    W: int,
    n_blocks: int,
    x_hbm_ref,
    bh_ref,
    bv_ref,
    out_ref,
    scratch,
    th_scratch,
    sem,
):
    # the padded base stays in HBM; each grid step DMAs only its row
    # tile + halo into VMEM scratch (the full image in VMEM OOMs at
    # the fo=-1 resolution, and XLA may also stage the kernel OUTPUT
    # in VMEM when it is small enough — budget for both)
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm_ref.at[b, pl.ds(i * TH, TH + 2 * R), :], scratch, sem
    )
    dma.start()
    dma.wait()
    dn = (((1,), (0,)), ((), ()))
    # Mosaic rejects Precision.HIGH; HIGHEST costs ~2x but these
    # matmuls are tiny relative to the stage. Accuracy matters: the DoG
    # contrast threshold is O(2.5e-3) (module docstring).
    prec = lax.Precision.HIGHEST
    for j in range(n_blocks):  # horizontal: one matmul per lane block
        win = scratch[:, j * 128 : j * 128 + 256]
        hb = lax.dot_general(
            win,
            bh_ref[:],
            dn,
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (TH+2R, C*128)
        for c in range(C):
            th_scratch[c, :, j * 128 : (j + 1) * 128] = hb[
                :, c * 128 : (c + 1) * 128
            ]
    for c in range(C):  # vertical: one matmul per channel
        v = lax.dot_general(
            bv_ref[c],
            th_scratch[c],
            dn,
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (TH, n_blocks*128)
        out_ref[0, c] = v[:, :W]


@partial(jax.jit, static_argnames=("taps", "interpret"))
def _blur_stack_batched(
    bases: jnp.ndarray,
    taps: tuple[tuple[float, ...], ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) bases -> (B, C, H, W) Gaussian stacks."""
    B, H, W = bases.shape
    C = len(taps)
    R = max((len(k) - 1) // 2 for k in taps)
    # Mosaic DMA row slices must be 8-aligned: round the halo up so the
    # (TH + 2R) scratch height is a multiple of 8 (extra edge rows are
    # weight-zero for every channel, harmless)
    R = -(-R // 4) * 4
    # TH=32 keeps the whole scoped-VMEM stack under 16 MB even when
    # XLA stages BOTH the kernel operand and result in VMEM (it does,
    # for single-frame sizes): result ~9.4 MB + operand ~2.1 MB +
    # out-block double buffer + tile scratches.
    TH = 32
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    n_blocks = -(-W // 128)
    # lane padding: exactly 64 edge columns on the left (the horizontal
    # window halo), right edge-padded so every 256-lane window exists
    WpH = n_blocks * 128 + 128
    padded = jnp.pad(
        bases.astype(jnp.float32),
        ((0, 0), (R, R + (Hp - H)), (64, WpH - W - 64)),
        mode="edge",
    )
    Bh, Bv = _block_band_mats(taps, TH, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            # the padded base stays in HBM explicitly — under pl.ANY
            # the compiler pulls the whole image into scoped VMEM when
            # it fits, which OOMs at fo=-1 sizes
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (256, C * 128),
                lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, TH, TH + 2 * R),
                lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, TH, W),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * R, WpH), jnp.float32),
            pltpu.VMEM((C, TH + 2 * R, n_blocks * 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        partial(_blur_stack_kernel, C, TH, R, W, n_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, W), jnp.float32),
        interpret=interpret,
    )(padded, jnp.asarray(Bh), jnp.asarray(Bv))
    return out[:, :, :H, :]


@lru_cache(maxsize=None)
def _blur_stack_fn(taps, interpret: bool):
    """custom_vmap wrapper: vmap maps onto the kernel's native batch
    grid dimension (compiled Pallas can't batch an HBM-space in_spec)."""

    @jax.custom_batching.custom_vmap
    def f(base):
        return _blur_stack_batched(base[None], taps, interpret)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, bases):  # noqa: ARG001
        del axis_size
        (bb,) = in_batched
        assert bb, "blur_stack_pallas: unbatched arg under vmap"
        return _blur_stack_batched(bases, taps, interpret), True

    return f


def blur_stack_pallas(
    base: jnp.ndarray,
    taps: tuple[tuple[float, ...], ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W) base -> (C, H, W) Gaussian stack, C = len(taps).

    Each output channel is the edge-padded separable convolution of
    `base` with its (static) tap vector. Fused single-pass Pallas
    kernel: per row-tile, the halo'd input is read once from VMEM and
    all channels' horizontal+vertical passes run on the VPU. vmap maps
    to the kernel's native batch grid axis (one compiled program for
    the whole chunk).
    """
    return _blur_stack_fn(taps, bool(interpret))(base)


def _pallas_blur_fits(h: int, w: int, channels: int) -> bool:
    """Whether the blur-stack kernel's scoped-VMEM footprint fits.

    XLA's buffer assignment promotes the kernel's operand/result into
    scoped VMEM at these sizes (observed: the result carries S(1) even
    with HBM in_specs); budget result + operand + staging under the
    16 MB limit with margin. Only the fo=-1 base octave (2452x768)
    exceeds it at KITTI shapes — that call falls back to band matmuls.
    """
    R, TH = 16, 32
    hp = -(-h // TH) * TH
    wp = -(-(w + 2 * R) // 128) * 128
    result = channels * hp * w * 4
    operand = (hp + 2 * R) * wp * 4
    staging = 2 * channels * TH * wp * 4 + (TH + 2 * R) * wp * 4
    return result + operand + staging < 14 * 1024 * 1024


def build_gaussian_octave_pallas(
    base: jnp.ndarray, sigma0: float, scales: int, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for build_gaussian_octave via the Pallas blur stack."""
    if not (interpret or _pallas_blur_fits(*base.shape, scales + 2)):
        return build_gaussian_octave(base, sigma0, scales)
    taps = _stack_taps(scales, float(sigma0))
    x = blur_stack_pallas(base, taps, interpret=interpret)
    return jnp.concatenate([base[None].astype(jnp.float32), x], axis=0)


def build_pyramid(
    img: jnp.ndarray,
    num_octaves: int,
    scales: int,
    sigma0: float = 1.6,
    assumed_blur: float = 0.5,
    first_octave: int = 0,
    impl: str = "auto",
):
    """Full Gaussian + DoG pyramids.

    Returns (gauss, dogs): lists over octaves of (scales+3, Ho, Wo) and
    (scales+2, Ho, Wo). Like OpenCV SIFT, the input is pre-blurred up to
    sigma0 assuming `assumed_blur` sensor blur.

    first_octave=-1 reproduces cv2.SIFT's default upsampled base octave
    (bilinear 2x, sensor blur doubles to 2*assumed_blur): on textured
    imagery HALF of cv2's keypoints live in that octave (measured on the
    corridor fixture: 370 of 730/frame; our octaves 0-2 matched cv2's
    217+103+35 almost exactly), so parity-grade keypoint populations
    need it. The stack then spans `num_octaves` octaves starting at
    `first_octave` — coordinate mapping back to input pixels is the
    caller's job via 2^(o + first_octave).
    """
    # "auto" resolves to the band matmul on every backend. The Pallas
    # block-banded kernel (impl="pallas") was built and measured: 0.303
    # vs 0.317 ms/frame batched at 1226x370 — FLOP-parity in practice
    # because XLA's dense band einsum already runs the MXU well. It is
    # NOT the default because the long-horizon marathon is numerically
    # chaotic at the 1e-5 scale: the kernel's different matmul
    # summation order (in-kernel HIGHEST over 256-lane windows vs
    # XLA HIGH over full rows) perturbs marginal DoG extrema enough to
    # cost 2-3 unexplained resets over 1024 frames (segment ATE
    # 43 -> 61-70 m) where the matmul pyramid has none — measured on
    # chip, identical taps. The validated numerics ship.
    if impl == "auto":
        impl = "matmul"
    if first_octave == -1:
        H, W = img.shape
        img = jax.image.resize(img, (2 * H, 2 * W), "linear")
        assumed_blur = 2.0 * assumed_blur
    sig_diff = math.sqrt(max(sigma0**2 - assumed_blur**2, 1e-8))
    if impl in ("pallas", "pallas_interpret"):
        interp = impl == "pallas_interpret"
        if interp or _pallas_blur_fits(*img.shape, 1):
            base_taps = (
                tuple(
                    _full_kernel_np(
                        sig_diff, max(1, int(math.ceil(3.0 * sig_diff)))
                    ).tolist()
                ),
            )
            base = blur_stack_pallas(img, base_taps, interpret=interp)[0]
        else:
            base = blur_2d(img, sig_diff)
        octave = partial(build_gaussian_octave_pallas, interpret=interp)
    else:
        base = blur_2d(img, sig_diff)
        octave = build_gaussian_octave
    gauss, dogs = [], []
    for o in range(num_octaves):
        stack = octave(base, sigma0, scales)
        gauss.append(stack)
        dogs.append(stack[1:] - stack[:-1])
        # next octave seeds from the level with 2*sigma0 blur
        base = downsample_2x(stack[scales])
    return gauss, dogs
