"""Fundamental-matrix epipolar error task (sequence datasets).

Parity target: reference tasks/FundamentalMatrix.py:89-161 — keypoints from
the previous frame tracked/matched into the current one; epipolar error
against the GT-derived F (precomputed from poses, datasets/kitti.py:10-22):
    error_i = |x1_i^T F x0_i| / ||(F x0_i)[:2]||   (clamped norm >= 1e-6)
radio = fraction with error < th; num = count. Also the RANSAC inlier-ratio
variant (FundamentalMatrix.py:12-86).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.geometry.ransac import ransac_fundamental

_HP = jax.lax.Precision.HIGHEST


def epipolar_errors(kps0_px, kps1_px, mask, F):
    """kps0/1 [K,2] pixel coords, F [3,3] with x1^T F x0 = 0. Returns
    (errors [K], mask)."""
    x0 = jnp.concatenate([kps0_px, jnp.ones_like(kps0_px[:, :1])], axis=1)
    x1 = jnp.concatenate([kps1_px, jnp.ones_like(kps1_px[:, :1])], axis=1)
    lines = jnp.matmul(x0, F.T, precision=_HP)          # [K, 3]
    num = jnp.abs(jnp.sum(x1 * lines, axis=1))
    den = jnp.maximum(jnp.linalg.norm(lines[:, 0:2], axis=1), 1e-6)
    return num / den, mask


def fundamental_metrics(kps0_px, kps1_px, mask, F, th: float = 3.0):
    """Returns dict(fundamental_error mean, radio, num) over valid entries
    (reference lines 140-161 average over *all* tracked points)."""
    err, mask = epipolar_errors(kps0_px, kps1_px, mask, F)
    n = jnp.maximum(jnp.sum(mask), 1)
    mean_err = jnp.sum(jnp.where(mask, err, 0.0)) / n
    hits = jnp.sum(mask & (err < th))
    return {
        "fundamental_error": mean_err,
        "fundamental_radio": hits / n,
        "fundamental_num": hits,
    }


def fundamental_ransac_ratio(kps0_px, kps1_px, mask, key, n_hyp: int = 512):
    """RANSAC inlier-ratio variant (reference FundamentalMatrix.py:12-86):
    estimate F from matches, report valid/total."""
    F, inl, ok = ransac_fundamental(kps0_px, kps1_px, mask, key, n_hyp=n_hyp)
    total = jnp.maximum(jnp.sum(mask), 1)
    ratio = jnp.where(ok, jnp.sum(inl) / total, 0.0)
    return {"fundamental_radio": ratio, "fundamental_num": jnp.sum(inl)}
