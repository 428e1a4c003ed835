"""Sharded batched evaluation: the full detect -> warp -> match -> solve ->
metric pipeline over a batch of pairs, pairs sharded on the mesh 'data' axis,
metric reduction via collectives (replaces the reference's per-pair Python
lists, model_interface.py:104-117, and its batch_size=1 single-device loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from keypoint_bench_tpu.geometry.ransac import ransac_homography
from keypoint_bench_tpu.geometry.warp import warp_homography
from keypoint_bench_tpu.ops.detect import DetectParams, detection
from keypoint_bench_tpu.ops.matching import brute_force_match
from keypoint_bench_tpu.tasks.repeatability import repeatability_pair


def _pair_pipeline(model_fn, params, detect_params, th, bf_max_distance,
                   img0, img1, H, Hinv, width, height, scale, key):
    """One pair, fully on device: model x2 -> detect x2 -> warp both ways ->
    repeatability metrics; BF match -> RANSAC homography -> corner error."""
    score0, desc0 = model_fn(params, img0[None])
    score1, desc1 = model_fn(params, img1[None])
    k0, v0 = detection(score0[0], detect_params)
    k1, v1 = detection(score1[0], detect_params)

    a0, a01, va = warp_homography(k0, v0, H, width, height)
    b0, b10, vb = warp_homography(k1, v1, Hinv, width, height)
    rep = repeatability_pair(k0, v0, k1, v1, a0, a01, va, b0, b10, vb,
                             scale, th)

    if desc0 is not None:
        m0, m1, ok = brute_force_match(k0, va, k1, vb, desc0[0], desc1[0],
                                       bf_max_distance)
        s = jnp.stack([width - 1.0, height - 1.0])
        H_est, inl, ok_h = ransac_homography(m0[:, 0:2] * s, m1[:, 0:2] * s,
                                             ok, key, n_hyp=256)
        n_inl = jnp.where(ok_h, jnp.sum(inl), 0)
    else:
        n_inl = jnp.zeros((), jnp.int32)
    return {
        "repeatability": rep["repeatability"],
        "mean_error": rep["mean_error"],
        "num_feat": rep["num_feat"],
        "gt_num": rep["gt_num"],
        "homography_inliers": n_inl,
    }


def batched_repeatability_step(model_fn, params, detect_params: DetectParams,
                               imgs0, imgs1, Hs, Hinvs, sizes, scales, keys,
                               th: float = 3.0, bf_max_distance: float = 5.0):
    """vmapped pair pipeline over the leading batch axis. Per-pair outputs
    (no in-graph reduction): the host accumulates across batches + the ragged
    tail so the final means cover every pair (reference protocol:
    model_interface.py:119-133 means over all pairs)."""
    fn = functools.partial(_pair_pipeline, model_fn, params, detect_params,
                           th, bf_max_distance)
    out = jax.vmap(
        lambda i0, i1, H, Hi, sz, sc, k: fn(i0, i1, H, Hi, sz[0], sz[1], sc, k)
    )(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)
    return {
        "repeatability": out["repeatability"],
        "mean_error": out["mean_error"],
        "num_feat": out["num_feat"].astype(jnp.float32),
        "gt_num": out["gt_num"],
        "homography_inliers": out["homography_inliers"].astype(jnp.float32),
    }


def _mha_pair_pipeline(model_fn, params, detect_params, thresholds,
                       bf_max_distance, img0, img1, H, Hinv, width, height,
                       scale, key):
    """One MHA pair fully on device: model x2 -> detect -> covisibility warp
    -> BF match -> RANSAC homography -> corner-transfer hits."""
    from keypoint_bench_tpu.tasks.mha import mha_pair

    score0, desc0 = model_fn(params, img0[None])
    score1, desc1 = model_fn(params, img1[None])
    k0, v0 = detection(score0[0], detect_params)
    k1, v1 = detection(score1[0], detect_params)
    _, _, va = warp_homography(k0, v0, H, width, height)
    _, _, vb = warp_homography(k1, v1, Hinv, width, height)
    m0, m1, ok = brute_force_match(k0, va, k1, vb, desc0[0], desc1[0],
                                   bf_max_distance)
    hits = mha_pair(m0, m1, ok, H, width, height,
                    img0.shape[0], img0.shape[1], key,
                    thresholds=thresholds, n_hyp=256)
    return hits


def sharded_mha_step(mesh, model_fn, params, detect_params: DetectParams,
                     thresholds=(3.0, 5.0, 7.0), bf_max_distance: float = 5.0):
    """Mesh-sharded batched MHA: pairs shard over 'data'; returns the
    per-pair hit matrix [B, T] (data-sharded) — the host accumulates across
    batches and the ragged tail so means cover every pair."""
    data_sh = lambda ndim: NamedSharding(mesh, P("data", *[None] * (ndim - 1)))
    fn = functools.partial(_mha_pair_pipeline, model_fn, params,
                           detect_params, thresholds, bf_max_distance)

    def step(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys):
        return jax.vmap(
            lambda i0, i1, H, Hi, sz, sc, k: fn(i0, i1, H, Hi, sz[0], sz[1],
                                                sc, k)
        )(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)

    return jax.jit(
        step,
        in_shardings=(data_sh(4), data_sh(4), data_sh(3), data_sh(3),
                      data_sh(2), data_sh(1), data_sh(1)),
        out_shardings=data_sh(2))


def _auc_pair_pipeline(model_fn, params, detect_params, solver, n_hyp,
                       bf_max_distance, img0, img1, K0, K1, pose01, key):
    """One AUC pair fully on device: model x2 -> detect -> BF match ->
    essential RANSAC + recoverPose -> pose error (180 on failure)."""
    from keypoint_bench_tpu.tasks.auc import estimate_pose_pair, pose_error

    score0, desc0 = model_fn(params, img0[None])
    score1, desc1 = model_fn(params, img1[None])
    k0, v0 = detection(score0[0], detect_params)
    k1, v1 = detection(score1[0], detect_params)
    m0, m1, ok = brute_force_match(k0, v0, k1, v1, desc0[0], desc1[0],
                                   bf_max_distance)
    h0, w0 = img0.shape[0], img0.shape[1]
    h1, w1 = img1.shape[0], img1.shape[1]
    p0 = m0[:, 0:2] * jnp.asarray([w0 - 1.0, h0 - 1.0])
    p1 = m1[:, 0:2] * jnp.asarray([w1 - 1.0, h1 - 1.0])
    R, t, pm, n_in, okp = estimate_pose_pair(p0, p1, ok, K0, K1, key,
                                             n_hyp=n_hyp, solver=solver)
    err = jnp.where(okp, pose_error(R, t, pose01), 180.0)
    n_in = jnp.where(okp, n_in, 0)
    return err, n_in


def sharded_auc_step(mesh, model_fn, params, detect_params: DetectParams,
                     solver: str = "8pt", n_hyp: int = 4096,
                     bf_max_distance: float = 5.0):
    """Mesh-sharded batched AUC: pairs shard over 'data'; returns per-pair
    (pose errors [B], inlier counts [B]) — AUC needs the full error list for
    its recall curve, so reduction happens host-side at end of run.
    Requires uniform image shapes across the batch (pad/scale datasets)."""
    data_sh = lambda ndim: NamedSharding(mesh, P("data", *[None] * (ndim - 1)))
    fn = functools.partial(_auc_pair_pipeline, model_fn, params,
                           detect_params, solver, n_hyp, bf_max_distance)

    def step(imgs0, imgs1, K0s, K1s, poses01, keys):
        return jax.vmap(fn)(imgs0, imgs1, K0s, K1s, poses01, keys)

    return jax.jit(
        step,
        in_shardings=(data_sh(4), data_sh(4), data_sh(3), data_sh(3),
                      data_sh(3), data_sh(1)),
        out_shardings=(data_sh(1), data_sh(1)))


def sharded_eval_step(mesh, model_fn, params, detect_params: DetectParams,
                      th: float = 3.0, bf_max_distance: float = 5.0):
    """Build a jitted, mesh-sharded batched repeatability step.

    Inputs shard over 'data' on their leading axis; params replicate; the
    per-pair outputs stay data-sharded [B] (the host gathers them into its
    journal). Returns fn(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)."""
    data_sh = lambda ndim: NamedSharding(mesh, P("data", *[None] * (ndim - 1)))

    def step(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys):
        return batched_repeatability_step(model_fn, params, detect_params,
                                          imgs0, imgs1, Hs, Hinvs, sizes,
                                          scales, keys, th=th,
                                          bf_max_distance=bf_max_distance)

    return jax.jit(
        step,
        in_shardings=(data_sh(4), data_sh(4), data_sh(3), data_sh(3),
                      data_sh(2), data_sh(1), data_sh(1)),
        out_shardings={"repeatability": data_sh(1), "mean_error": data_sh(1),
                       "num_feat": data_sh(1), "gt_num": data_sh(1),
                       "homography_inliers": data_sh(1)})
