"""Repeatability metric over one warped image pair, fully on-device.

Parity target: reference tasks/repeatability.py:54-92 `val_key_points` —
  * warp kps0 by warp01 and kps1 by warp10 (covisible sets),
  * mutual argmin over dist_mutual = (dist(kps0_cov, kps10_cov)
    + dist(kps1_cov, kps01_cov)^T) / 2 with the first min(M,N) diagonal
    entries (in *compacted valid order*) masked to 99999,
  * a pair counts iff its averaged distance * scale <= th, where scale is
    `resize` (HPatches) or `width`,
  * repeatability = #pairs / min(N0, N1) with N0/N1 the pre-warp counts.

TPU design: no compaction — distances of invalid rows/cols are pushed to a
large constant; the reference's index-equality diagonal hack is replicated via
cumsum ranks over the validity masks.
"""
from __future__ import annotations

import jax.numpy as jnp

_DIAG = 99999.0
_BIG = 1e9


def _masked_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a[:, None, :] - b[None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-24)


def repeatability_pair(kpts0, valid0, kpts1, valid1,
                       w01_kpts0, w01_kpts01, v01,
                       w10_kpts1, w10_kpts10, v10,
                       scale, th: float = 3.0):
    """Compute (num_feat, repeatability, mean_error) for one pair.

    kpts0/kpts1: [K,3] detections with validity masks (pre-warp).
    w01_*: outputs of warp_points for kps0 -> frame1 (kpts0_valid, kpts01_valid,
    mask), w10_* likewise for kps1 -> frame0. `scale` is the pixel scale the
    normalized distances are multiplied by (reference lines 76-81).
    """
    n0 = jnp.sum(valid0)
    n1 = jnp.sum(valid1)
    num_feat = jnp.minimum(n0, n1)

    pair_ok = v01[:, None] & v10[None, :]
    dist01 = _masked_dist(w01_kpts0, w10_kpts10)   # [K0, K1]
    dist10 = _masked_dist(w10_kpts1, w01_kpts01)   # [K1, K0]
    dm = (dist01 + dist10.T) / 2.0

    # reference diagonal hack: after compaction to valid-only rows/cols, entries
    # with equal compacted index are set to 99999. Replicate via ranks.
    rank0 = jnp.cumsum(v01.astype(jnp.int32)) - 1
    rank1 = jnp.cumsum(v10.astype(jnp.int32)) - 1
    diag = (rank0[:, None] == rank1[None, :]) & pair_ok
    dm = jnp.where(diag, _DIAG, dm)
    dm = jnp.where(pair_ok, dm, _BIG)

    # mutual argmin (reference mutual_argmax on negated values): a pair (i, j)
    # is mutual iff dm[i, j] equals both the row-i min and the col-j min.
    row_min = jnp.min(dm, axis=1, keepdims=True)
    col_min = jnp.min(dm, axis=0, keepdims=True)
    mutual = (dm == row_min) & (dm == col_min) & pair_ok

    d_scaled = dm * scale
    hit = mutual & (d_scaled <= th)
    gt_num = jnp.sum(hit)
    err_sum = jnp.sum(jnp.where(hit, d_scaled, 0.0))
    mean_error = jnp.where(gt_num > 0, err_sum / gt_num, jnp.nan)

    rep = jnp.where(num_feat > 0, gt_num / jnp.maximum(num_feat, 1), 0.0)
    # reference early-returns rep=0, num_feat=0 when either covisible set is
    # empty (tasks/repeatability.py:61-67)
    either_empty = (jnp.sum(v01) == 0) | (jnp.sum(v10) == 0)
    rep = jnp.where(either_empty, 0.0, rep)
    num_feat = jnp.where(either_empty, 0, num_feat)
    return {
        "num_feat": num_feat,
        "repeatability": rep,
        "mean_error": mean_error,
        "gt_num": gt_num,
    }
