"""Difference-of-Gaussians (SIFT detection stage) as an on-device score map.

The reference advertises SIFT (README.md:4-5) but ships an empty
models/SIFT.py (SURVEY.md §2.2). This implements the DoG scale-space
extremum response on a single octave: gaussian ladder sigma_k = 1.6 * k^(s/2),
DoG differences, 3x3x3 extremum test, score = |DoG| at extrema.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keypoint_bench_tpu.models.registry import register


def _gaussian_kernel(sigma: float):
    half = max(int(3 * sigma), 1)
    x = np.arange(-half, half + 1)
    g = np.exp(-x ** 2 / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding; img [H, W]."""
    g = _gaussian_kernel(sigma)
    k = len(g)
    x = jnp.pad(img, ((k // 2, k // 2), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        x[None, :, :, None], jnp.asarray(g)[:, None, None, None],
        (1, 1), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")))[0, :, :, 0]
    x = jnp.pad(x, ((0, 0), (k // 2, k // 2)), mode="reflect")
    x = lax.conv_general_dilated(
        x[None, :, :, None], jnp.asarray(g)[None, :, None, None],
        (1, 1), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")))[0, :, :, 0]
    return x


def dog_score(gray: jnp.ndarray, n_scales: int = 5, sigma0: float = 1.6,
              contrast_th: float = 0.015) -> jnp.ndarray:
    """gray [H, W] in [0,1] -> DoG extremum score map [H, W]."""
    k = 2.0 ** (1.0 / 3.0)
    blurs = [_blur(gray, sigma0 * k ** i) for i in range(n_scales)]
    dogs = jnp.stack([blurs[i + 1] - blurs[i]
                      for i in range(n_scales - 1)])   # [S, H, W]
    s, h, w = dogs.shape
    # 3x3 spatial max/min per scale
    sp_max = lax.reduce_window(dogs, -jnp.inf, lax.max, (1, 3, 3), (1, 1, 1),
                               "SAME")
    sp_min = lax.reduce_window(dogs, jnp.inf, lax.min, (1, 3, 3), (1, 1, 1),
                               "SAME")
    score = jnp.zeros((h, w))
    for i in range(1, s - 1):
        up_max = jnp.maximum(sp_max[i - 1], sp_max[i + 1])
        up_min = jnp.minimum(sp_min[i - 1], sp_min[i + 1])
        d = dogs[i]
        is_max = (d >= sp_max[i]) & (d > up_max) & (d > contrast_th)
        is_min = (d <= sp_min[i]) & (d < up_min) & (d < -contrast_th)
        score = jnp.maximum(score, jnp.where(is_max | is_min, jnp.abs(d),
                                             0.0))
    return score


@register("SIFT")
def sift(params: dict, image: jnp.ndarray):
    """image [B,H,W,3] in [0,1] -> (DoG extremum score [B,H,W,1], None)."""
    n_scales = int(params.get("n_scales", 5))
    contrast = float(params.get("contrast_th", 0.015))
    gray = jnp.mean(image, axis=-1)
    score = jax.vmap(lambda g: dog_score(g, n_scales, 1.6, contrast))(gray)
    return score[..., None], None
