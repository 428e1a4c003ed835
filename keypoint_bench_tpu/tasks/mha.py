"""Mean Homography Accuracy over one HPatches pair, fully on-device.

Parity target: reference tasks/MHA.py:11-72 — detect, warp to covisible sets,
brute-force match, RANSAC homography, warp 4 corners by estimated vs GT H
(the reference's corner list mixes h/w per its own convention — replicated),
scale by (resize/h, resize/w), hit = mean corner distance <= th.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.geometry.ransac import ransac_homography

_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def mha_pair(m_pts0, m_pts1, match_mask, H_gt, width, height,
             resize_h, resize_w, key, thresholds=(3.0, 5.0, 7.0),
             n_hyp: int = 512):
    """m_pts0/1 [K, >=2] matched keypoints normalized to [0,1] (covisible,
    already brute-force matched); H_gt [3,3]; width/height original image
    size; resize_* the network input size. Returns [len(thresholds)] hits."""
    w = jnp.asarray(width, jnp.float32)
    h = jnp.asarray(height, jnp.float32)
    scale = jnp.stack([w - 1.0, h - 1.0])
    p0 = m_pts0[:, 0:2] * scale
    p1 = m_pts1[:, 0:2] * scale

    H_est, inl, ok = ransac_homography(p0, p1, match_mask, key, n_hyp=n_hyp,
                                       thresh=3.0)

    # corner transfer (reference MHA.py:51-66, including its (h,w) corner
    # convention)
    corners = jnp.stack([
        jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.ones(())]),
        jnp.stack([h - 1.0, jnp.zeros(()), jnp.ones(())]),
        jnp.stack([jnp.zeros(()), w - 1.0, jnp.ones(())]),
        jnp.stack([h - 1.0, w - 1.0, jnp.ones(())]),
    ])

    def transfer(H):
        q = _mm(corners, H.T)
        return q[:, 0:2] / q[:, 2:3]

    c_gt = transfer(H_gt)
    c_est = transfer(H_est)
    rs = jnp.stack([resize_h / h, resize_w / w])
    d = jnp.linalg.norm((c_gt - c_est) * rs[None, :], axis=1)
    mean_dist = jnp.mean(d)
    ths = jnp.asarray(thresholds, jnp.float32)
    hits = (mean_dist <= ths).astype(jnp.float32)
    return jnp.where(ok, hits, jnp.zeros_like(hits))
