"""Soft position prediction from descriptor similarity (reference
utils/extracter.py:103-126 `predict_positions`): desc-similarity softmax with
temperature 0.01 and a 0.01 dustbin column -> expected (x, y) per source
position, plus the bilinearly-sampled self-similarity score at the predicted
position."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ops.grid_sample import sample_bilinear_pixels

_HP = jax.lax.Precision.HIGHEST


def predict_positions(desc0: jnp.ndarray, desc1: jnp.ndarray) -> jnp.ndarray:
    """desc maps [H, W, D] -> [H*W, 3] of (x, y in [0,1], score)."""
    h, w, d = desc0.shape
    xs = jnp.linspace(1 / w / 2, 1 - 1 / w / 2, w)
    ys = jnp.linspace(1 / h / 2, 1 - 1 / h / 2, h)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)  # [HW, 2] (x,y)

    f0 = desc0.reshape(-1, d)
    f1 = desc1.reshape(-1, d)
    sim = jnp.matmul(f0, f1.T, precision=_HP)                   # [HW, HW]
    dustbin = jnp.full((sim.shape[0], 1), 0.01)
    simd = jnp.concatenate([sim, dustbin], axis=1)
    max_v = jnp.max(simd, axis=1, keepdims=True)
    x_exp = jnp.exp((simd - max_v) / 0.01)[:, :-1]              # [HW, HW]

    denom = jnp.sum(x_exp, axis=1, keepdims=True)
    xy = jnp.matmul(x_exp, grid, precision=_HP) / denom         # [HW, 2]

    # per-row bilinear sample of its own similarity map at the predicted xy
    # (reference samples with align_corners=True on pts*2-1)
    px = xy[:, 0] * (w - 1)
    py = xy[:, 1] * (h - 1)

    def sample_row(row, x, y):
        return sample_bilinear_pixels(row.reshape(h, w, 1), x[None],
                                      y[None])[0, 0]

    scores = jax.vmap(sample_row)(x_exp, px, py)
    return jnp.concatenate([xy, scores[:, None]], axis=1)
