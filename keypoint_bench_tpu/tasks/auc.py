"""Relative-pose AUC over MegaDepth pairs, on-device pose estimation.

Parity target: reference tasks/AUC.py:40-155 — brute-force match, normalize by
intrinsics with threshold 1px / f_mean, essential RANSAC + recoverPose,
pose error = max(angular t error with 180-deg ambiguity, angular R error);
failure -> 180 deg. End-of-run trapezoid AUC (pose_auc) over the error-recall
curve at thresholds {5, 10, 20} deg.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.geometry.ransac import ransac_essential, recover_pose

_HP = jax.lax.Precision.HIGHEST


def estimate_pose_pair(m_pts0, m_pts1, match_mask, K0, K1, key,
                       thresh_px: float = 1.0, n_hyp: int = 4096,
                       solver: str = "8pt"):
    """m_pts0/1 [K,2] matched pixel coords; returns (R [3,3], t [3],
    inlier_mask [K], n_inliers, ok).

    solver: "8pt" (default; 8-point minimal + LO refit) or "5pt" (Stewenius
    five-point minimal solver, geometry/fivepoint.py — exact on minimal
    samples, the better choice in small-match-count regimes; cv2's
    findEssentialMat kernel is 5-point, AUC.py:50)."""
    f_mean = (K0[0, 0] + K1[1, 1] + K0[0, 0] + K1[1, 1]) / 4.0  # AUC.py:45
    norm_th = thresh_px / f_mean

    p0n = (m_pts0 - jnp.stack([K0[0, 2], K0[1, 2]])[None]) / \
        jnp.stack([K0[0, 0], K0[1, 1]])[None]
    p1n = (m_pts1 - jnp.stack([K1[0, 2], K1[1, 2]])[None]) / \
        jnp.stack([K1[0, 0], K1[1, 1]])[None]

    if solver == "5pt":
        from keypoint_bench_tpu.geometry.fivepoint import ransac_essential_5pt
        # each 5-point sample yields up to 10 candidates, so fewer samples
        # explore at least as many hypotheses as the 8-point path
        E, inl, ok_e = ransac_essential_5pt(p0n, p1n, match_mask, key,
                                            n_hyp=max(n_hyp // 8, 64),
                                            thresh=norm_th)
    else:
        E, inl, ok_e = ransac_essential(p0n, p1n, match_mask, key,
                                        n_hyp=n_hyp, thresh=norm_th)
    R, t, pose_mask, n_in = recover_pose(E, p0n, p1n, inl)
    ok = ok_e & (jnp.sum(match_mask) >= 5)
    return R, t, pose_mask, n_in, ok


def pose_error(R_est, t_est, T_0to1):
    """max(angular errors) in degrees (reference AUC.py:66-84)."""
    R_gt = T_0to1[:3, :3]
    t_gt = T_0to1[:3, 3]
    n = jnp.linalg.norm(t_est) * jnp.linalg.norm(t_gt)
    cos_t = jnp.clip(jnp.dot(t_est, t_gt) / jnp.maximum(n, 1e-12), -1.0, 1.0)
    err_t = jnp.degrees(jnp.arccos(cos_t))
    err_t = jnp.minimum(err_t, 180.0 - err_t)
    cos_r = jnp.clip((jnp.trace(jnp.matmul(R_est.T, R_gt, precision=_HP)) - 1)
                     / 2.0, -1.0, 1.0)
    err_r = jnp.degrees(jnp.abs(jnp.arccos(cos_r)))
    return jnp.maximum(err_t, err_r)


def pose_auc(errors, thresholds=(5.0, 10.0, 20.0)):
    """Trapezoid AUC of the error-recall curve (reference AUC.py:86-98),
    numpy host-side reduction."""
    errors = np.sort(np.asarray(errors))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last = np.searchsorted(errors, t)
        r = np.r_[recall[:last], recall[last - 1]]
        e = np.r_[errors[:last], t]
        aucs.append(np.trapezoid(r, x=e) / t)
    return aucs
