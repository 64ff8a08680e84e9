"""Gaussian scale-space and Difference-of-Gaussians pyramids.

Replaces the scale-space machinery inside `cv2.SIFT` (N1 in SURVEY.md
§2.3). Blurs are separable depthwise convolutions — XLA maps them onto the
TPU convolution units and fuses the DoG subtraction; downsampling is a
stride-2 slice. All shapes are static functions of the input size.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Odd-length 1D Gaussian, radius ceil(3 sigma) (matches cv2's 8U..
    no — cv2 uses round(sigma*4*2+1)|1 for SIFT; 3 sigma keeps kernels
    compact with <0.3% truncated mass, adequate for detection)."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def blur_2d(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W) with SAME edge handling."""
    k = gaussian_kernel_1d(sigma, img.dtype)
    r = (k.shape[0] - 1) // 2
    x = img[None, None, :, :]  # NCHW
    # horizontal then vertical, SAME padding via explicit edge pad
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (r, r)), mode="edge")
    x = lax.conv_general_dilated(
        x,
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    x = lax.conv_general_dilated(
        x,
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return x[0, 0]


def build_gaussian_octave(
    base: jnp.ndarray, sigma0: float, scales: int
) -> jnp.ndarray:
    """(scales+3, H, W) Gaussian stack for one octave.

    Level i has absolute blur sigma0 * 2^(i/scales). All levels are blurred
    DIRECTLY from the octave base in one two-pass separable multi-channel
    convolution (1 input channel -> scales+2 output channels horizontally,
    then depthwise vertically): two conv dispatches per octave instead of
    the classic 2*(scales+2) incremental ones — the incremental recurrence
    is a CPU-cache trick that only serializes a TPU.
    """
    k = 2.0 ** (1.0 / scales)
    n_out = scales + 2  # levels 1..scales+2 (level 0 is the base itself)
    sigmas = [
        math.sqrt(max((sigma0 * k ** (i + 1)) ** 2 - sigma0**2, 1e-8))
        for i in range(n_out)
    ]
    radius = max(1, int(math.ceil(3.0 * max(sigmas))))
    taps = 2 * radius + 1
    kernels = []
    for s in sigmas:
        x = jnp.arange(-radius, radius + 1, dtype=base.dtype)
        g = jnp.exp(-0.5 * (x / s) ** 2)
        kernels.append(g / jnp.sum(g))
    ker = jnp.stack(kernels)  # (n_out, taps)

    x = base[None, None, :, :]  # (1, 1, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (radius, radius)), mode="edge")
    # horizontal: 1 -> n_out channels
    x = lax.conv_general_dilated(
        x,
        ker[:, None, None, :],  # (O=n_out, I=1, 1, taps)
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (1, n_out, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (0, 0)), mode="edge")
    # vertical: depthwise per level
    x = lax.conv_general_dilated(
        x,
        ker[:, None, :, None],  # (O=n_out, I=1, taps, 1) with groups
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=n_out,
    )  # (1, n_out, H, W)
    return jnp.concatenate([base[None], x[0]], axis=0)


def downsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


def build_pyramid(
    img: jnp.ndarray,
    num_octaves: int,
    scales: int,
    sigma0: float = 1.6,
    assumed_blur: float = 0.5,
):
    """Full Gaussian + DoG pyramids.

    Returns (gauss, dogs): lists over octaves of (scales+3, Ho, Wo) and
    (scales+2, Ho, Wo). Like OpenCV SIFT, the input is pre-blurred up to
    sigma0 assuming `assumed_blur` sensor blur (no 2x upsample octave —
    the -1 octave is an OpenCV option we trade for throughput; keypoint
    capacity is recovered by the per-octave caps).
    """
    sig_diff = math.sqrt(max(sigma0**2 - assumed_blur**2, 1e-8))
    base = blur_2d(img, sig_diff)
    gauss, dogs = [], []
    for o in range(num_octaves):
        stack = build_gaussian_octave(base, sigma0, scales)
        gauss.append(stack)
        dogs.append(stack[1:] - stack[:-1])
        # next octave seeds from the level with 2*sigma0 blur
        base = downsample_2x(stack[scales])
    return gauss, dogs
