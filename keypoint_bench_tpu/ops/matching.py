"""Brute-force descriptor matching: tiled MXU distance matrix + mutual-NN.

Semantics parity with the reference matcher (utils/matcher.py:206-234), which
grid-samples descriptors at keypoint locations then calls
`skimage.feature.match_descriptors(metric='euclidean', max_distance, cross_check=True)`:
for each query the euclidean nearest neighbour, kept iff it is mutual and its
distance is strictly below `max_distance`.

TPU design: fixed-K descriptors with validity masks; the distance matrix is a
single f32 matmul (|a-b|^2 = |a|^2 + |b|^2 - 2ab, MXU-friendly); invalid
rows/cols are pushed to +inf so masked entries can never match. Outputs are
fixed-size index arrays plus a match mask instead of variable-length pairs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ops.grid_sample import sample_at_points

_BIG = 1e30


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[M, D] x [N, D] -> [M, N] squared euclidean distances (one MXU matmul).

    f32 inputs use a HIGHEST-precision dot (the parity path — skimage
    computes in f64 on host). bf16 inputs take a single-pass MXU dot with
    f32 accumulation and f32 norms: ~30x cheaper in-graph (the HIGHEST f32
    dot is a 6-pass bf16 decomposition — measured +449 us/map vs +15 at
    K=1000/B=96 pairs, tools/profile_r7.py); products of bf16 values are
    exact in f32, so the only extra error is the caller's input rounding.
    """
    a2 = jnp.sum(a.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    b2 = jnp.sum(b.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
        ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    else:
        ab = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


def mutual_nn_match(desc0: jnp.ndarray, desc1: jnp.ndarray,
                    valid0: jnp.ndarray, valid1: jnp.ndarray,
                    max_distance: float = jnp.inf):
    """Mutual nearest-neighbour matching with a distance cutoff.

    Returns (idx1_of_0 [M], match_mask [M]): for each descriptor i in desc0,
    its NN j in desc1; mask true iff mutual, both valid, and
    dist(i, j) < max_distance (strict, as skimage does).
    """
    d2 = pairwise_sqdist(desc0, desc1)
    d2 = jnp.where(valid0[:, None] & valid1[None, :], d2, _BIG)
    m, n = d2.shape
    nn01 = jnp.argmin(d2, axis=1)          # [M] best j for each i
    nn10 = jnp.argmin(d2, axis=0)          # [N] best i for each j
    # gather-free mutual check: TPU gathers are ~160ns/point latency-bound
    # (PERF.md), so nn10[nn01] and take_along_axis cost ~0.3 ms/pair at
    # K=1000 — two [M, N] one-hot compares + reduce are ~20x cheaper and
    # exact (built from the same first-tie argmin indices)
    eq01 = nn01[:, None] == jax.lax.iota(jnp.int32, n)[None, :]   # [M, N]
    eq10 = nn10[None, :] == jax.lax.iota(jnp.int32, m)[:, None]   # [M, N]
    mutual = jnp.any(eq01 & eq10, axis=1)
    best = jnp.min(d2, axis=1)             # == d2[i, nn01[i]]
    ok = mutual & valid0 & (best < float(max_distance) ** 2) & (best < _BIG)
    return nn01, ok


def take_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values[idx] as a one-hot MXU matmul instead of a row gather
    (exact selection: the one-hot rows pick f32 values bit-exactly via the
    bf16x3 decomposition; TPU row gathers are ~160ns/point latency-bound).
    values [N, D], idx [M] int -> [M, D]."""
    n = values.shape[0]
    onehot = (idx[:, None] == jax.lax.iota(jnp.int32, n)[None, :])
    return jnp.dot(onehot.astype(jnp.float32), values.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(values.dtype)


def brute_force_match(kpts0: jnp.ndarray, valid0: jnp.ndarray,
                      kpts1: jnp.ndarray, valid1: jnp.ndarray,
                      desc_map0: jnp.ndarray, desc_map1: jnp.ndarray,
                      max_distance: float = 5.0):
    """Full reference brute-force matcher (utils/matcher.py:206-234).

    kpts: [K, 3] normalized (x, y, score); desc_map: [H, W, D].
    Returns (m_kpts0 [K,3], m_kpts1 [K,3], match_mask [K]) where row i pairs
    kpts0[i] with its matched keypoint (rows with mask False are padding).
    """
    desc0 = sample_at_points(desc_map0, kpts0)
    desc1 = sample_at_points(desc_map1, kpts1)
    nn01, ok = mutual_nn_match(desc0, desc1, valid0, valid1, max_distance)
    m_kpts1 = take_rows(kpts1, nn01)
    return kpts0, m_kpts1, ok
