"""Bilinear sampling with torch `grid_sample(align_corners=True)` semantics.

The reference samples descriptor maps / image patches at keypoint locations via
`F.grid_sample(..., align_corners=True, padding_mode='zeros')` with normalized
coords built as `(p - 0.5) * 2` for p in [0,1] (utils/matcher.py:221-226) or
`p/(S-1)*2-1` for p in pixels (utils/matcher.py:124,130). align_corners=True
maps grid -1 -> pixel 0 and +1 -> pixel S-1, so both conventions reduce to
sampling at pixel coordinate `p*(S-1)` / `p` respectively. We implement the
pixel-coordinate form directly; out-of-bounds corners contribute zeros.
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; rows/cols int arrays [...]; returns [..., C] with zeros
    for out-of-bounds indices (padding_mode='zeros')."""
    h, w = img.shape[0], img.shape[1]
    inb = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    rs = jnp.clip(rows, 0, h - 1)
    cs = jnp.clip(cols, 0, w - 1)
    flat = img.reshape(h * w, -1)
    out = flat[rs * w + cs]
    return jnp.where(inb[..., None], out, 0.0)


def sample_bilinear_pixels(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample img [H, W, C] at continuous pixel coords (px, py) [...].

    Returns [..., C]. Out-of-bounds contributions are zero, matching
    grid_sample(padding_mode='zeros'). Coordinates are *pixel* coordinates
    (0 .. S-1), i.e. already converted from whichever normalization applies.
    """
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    dx = (px - x0)[..., None]
    dy = (py - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = _gather_2d(img, y0i, x0i)
    v01 = _gather_2d(img, y0i, x0i + 1)
    v10 = _gather_2d(img, y0i + 1, x0i)
    v11 = _gather_2d(img, y0i + 1, x0i + 1)
    return ((1 - dy) * (1 - dx) * v00 + (1 - dy) * dx * v01
            + dy * (1 - dx) * v10 + dy * dx * v11)


def grid_sample_align_corners(img: jnp.ndarray, pts01: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H, W, C] at pts01 [N, 2] of (x, y) in [0, 1].

    Equivalent to torch grid_sample(align_corners=True) on grid (p-0.5)*2:
    pixel coordinate = p * (S - 1). Returns [N, C].
    """
    h, w = img.shape[0], img.shape[1]
    px = pts01[:, 0] * (w - 1)
    py = pts01[:, 1] * (h - 1)
    return sample_bilinear_pixels(img, px, py)


def sample_at_points(feature_map: jnp.ndarray, kpts: jnp.ndarray) -> jnp.ndarray:
    """Descriptor lookup used by the brute-force matcher
    (reference utils/matcher.py:221-226): feature_map [H, W, C], kpts [K, >=2]
    with normalized (x, y) in columns 0:2 -> [K, C]."""
    return grid_sample_align_corners(feature_map, kpts[:, 0:2])
