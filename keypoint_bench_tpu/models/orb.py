"""FAST corner detector (ORB's detection stage) as an on-device score map.

The reference advertises ORB (README.md:4-5) but ships an empty models/ORB.py
(0 bytes — SURVEY.md §2.2). This is a real implementation of FAST-9/16:
a pixel is a corner iff >= 9 contiguous pixels on the radius-3 Bresenham
circle are all brighter than I(p)+t or all darker than I(p)-t; the score is
the summed threshold excess of the qualifying arc (cv2 FAST-score flavour).
Fully vectorized: 16 shifted copies + 16 rotated 9-run tests on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models.registry import register

# radius-3 Bresenham circle offsets (row, col), clockwise from 12 o'clock
_CIRCLE = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2),
           (3, 1), (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3),
           (-2, -2), (-3, -1)]


def fast_score(gray: jnp.ndarray, threshold: float = 10.0,
               arc: int = 9) -> jnp.ndarray:
    """gray [H, W] (0..255 scale) -> FAST corner score map [H, W]."""
    h, w = gray.shape
    pad = jnp.pad(gray, 3, mode="edge")
    ring = jnp.stack([pad[3 + dy: 3 + dy + h, 3 + dx: 3 + dx + w]
                      for dy, dx in _CIRCLE])          # [16, H, W]
    d = ring - gray[None]
    bright = d > threshold
    dark = d < -threshold

    def has_run(m):
        mm = jnp.concatenate([m, m[: arc - 1]], axis=0)  # wrap
        runs = [jnp.all(mm[s: s + arc], axis=0) for s in range(16)]
        return jnp.any(jnp.stack(runs), axis=0)

    is_bright = has_run(bright)
    is_dark = has_run(dark)
    sb = jnp.sum(jnp.maximum(d - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.maximum(-d - threshold, 0.0), axis=0)
    score = jnp.where(is_bright, sb, 0.0) + jnp.where(is_dark, sd, 0.0)
    return score


@register("ORB")
def orb(params: dict, image: jnp.ndarray):
    """image [B,H,W,3] in [0,1] -> (FAST score map [B,H,W,1], None)."""
    threshold = float(params.get("threshold", 10.0))
    gray = jnp.mean(image, axis=-1) * 255.0

    score = jax.vmap(lambda g: fast_score(g, threshold))(gray)
    return score[..., None], None
