"""Harris corner detector as a fused on-device op (replaces the reference's
cv2.cornerHarris call, models/Harris.py:13-21).

Exact cv2.cornerHarris semantics: input uint8-quantized intensity (the
reference feeds (sum(RGB)*255).astype(uint8), which wraps mod 256 —
replicated); Sobel aperture `ksize` with REFLECT_101 borders and OpenCV's
scale 1/(2^(ksize-1) * block_size * 255); unnormalized block_size box sums of
the structure tensor; R = det(M) - k*trace(M)^2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keypoint_bench_tpu.models.registry import register


def _sobel_kernels(ksize: int):
    """OpenCV getDerivKernels for dx/dy, unnormalized (smooth x diff)."""
    if ksize == 3:
        smooth = np.array([1., 2., 1.], np.float32)
        diff = np.array([-1., 0., 1.], np.float32)
    elif ksize == 1:
        smooth = np.array([1.], np.float32)
        diff = np.array([-1., 0., 1.], np.float32)
    else:
        # general ksize via repeated convolution of the base kernels
        smooth = np.array([1.], np.float32)
        for _ in range(ksize - 1):
            smooth = np.convolve(smooth, [1., 1.])
        diff = np.convolve(np.convolve(np.ones(1), [1., 1.]),
                           [-1., 1.])
        for _ in range(ksize - 3):
            diff = np.convolve(diff, [1., 1.])
        smooth = smooth.astype(np.float32)
        diff = diff.astype(np.float32)
    kx = np.outer(smooth, diff)
    ky = np.outer(diff, smooth)
    return kx, ky


def _reflect101_pad(x, ph, pw):
    return jnp.pad(x, ((ph, ph), (pw, pw)), mode="reflect")


def _conv2(x, k):
    kh, kw = k.shape
    xp = _reflect101_pad(x, kh // 2, kw // 2)
    return lax.conv_general_dilated(
        xp[None, :, :, None], jnp.asarray(k)[:, :, None, None],
        (1, 1), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")),
        precision=jax.lax.Precision.HIGHEST)[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("block_size", "ksize", "k"))
def harris_response(gray_u8: jnp.ndarray, block_size: int = 5,
                    ksize: int = 3, k: float = 0.04) -> jnp.ndarray:
    """gray_u8 [H, W] float values in 0..255 (already uint8-quantized).
    Returns the cv2.cornerHarris-compatible response map [H, W]."""
    kx, ky = _sobel_kernels(ksize)
    scale = 1.0 / ((1 << (ksize - 1)) * block_size * 255.0)
    dx = _conv2(gray_u8, kx) * scale
    dy = _conv2(gray_u8, ky) * scale
    # unnormalized box sums with REFLECT_101 borders
    def box(v):
        vp = _reflect101_pad(v, block_size // 2, block_size // 2)
        return lax.reduce_window(vp, 0.0, lax.add,
                                 (block_size, block_size), (1, 1), "VALID")
    a = box(dx * dx)
    b = box(dx * dy)
    cc = box(dy * dy)
    return a * cc - b * b - k * (a + cc) ** 2


@register("Harris")
def harris(params: dict, image: jnp.ndarray):
    """image [B,H,W,3] in [0,1] -> (score [B,H,W,1], None). `params` carries
    block_size/ksize/k (config.yaml:64-67) instead of weights."""
    block_size = int(params.get("block_size", 5))
    ksize = int(params.get("ksize", 3))
    k = float(params.get("k", 0.04))
    gray = jnp.sum(image, axis=-1) * 255.0
    # replicate numpy's wrapping uint8 cast of the reference (Harris.py:15)
    gray = jnp.floor(gray) % 256.0

    def one(g):
        return harris_response(g, block_size, ksize, k)

    score = jax.vmap(one)(gray)
    return score[..., None], None
