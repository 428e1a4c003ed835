"""Monocular visual odometry with GT-scale injection.

Parity target: reference tasks/visual_odometer.py:10-96 — per frame pair:
detect on both score maps, match (LK / brute-force / LightGlue), essential
RANSAC + recoverPose at (focal, pp), then chain
    scale = ||t_gt - t_gt_prev||
    if scale >= 0.001:  R_est = R_prev @ R ; t_est = t_prev + scale * R_prev @ t
(the serial part is this tiny compose; detect/match/solve are batchable
across frame pairs, SURVEY.md §3.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.geometry.ransac import ransac_essential, recover_pose

_HP = jax.lax.Precision.HIGHEST


def vo_pair_pose(m_pts0_px, m_pts1_px, match_mask, fx, cx, cy, key,
                 n_hyp: int = 4096, thresh_px: float = 1.0):
    """Relative pose for one frame pair from matched pixel coords.
    Single-focal pinhole like cv2.findEssentialMat(focal, pp)
    (visual_odometer.py:75-79). Returns (R, t, n_inliers, ok)."""
    pp = jnp.stack([cx, cy])
    p0n = (m_pts0_px - pp[None]) / fx
    p1n = (m_pts1_px - pp[None]) / fx
    E, inl, ok = ransac_essential(p0n, p1n, match_mask, key, n_hyp=n_hyp,
                                  thresh=thresh_px / fx)
    R, t, _, n_in = recover_pose(E, p0n, p1n, inl)
    return R, t, n_in, ok


def chain_poses(rel_R: np.ndarray, rel_t: np.ndarray, ok: np.ndarray,
                scales: np.ndarray):
    """Host-side pose chaining over the whole sequence (the only serial part).

    rel_R [T,3,3], rel_t [T,3], ok [T], scales [T] = ||t_gt_i - t_gt_{i-1}||.
    Returns (R_est [T+1,3,3], t_est [T+1,3,1]) starting at identity, matching
    the update rule at visual_odometer.py:81-89.
    """
    R_list = [np.eye(3)]
    t_list = [np.zeros((3, 1))]
    for i in range(rel_R.shape[0]):
        R_prev, t_prev = R_list[-1], t_list[-1]
        if ok[i] and scales[i] >= 0.001:
            R_new = R_prev @ rel_R[i]
            t_new = t_prev + float(scales[i]) * (R_prev @ rel_t[i][:, None])
        else:
            R_new, t_new = R_prev, t_prev
        R_list.append(R_new)
        t_list.append(t_new)
    return np.stack(R_list), np.stack(t_list)


def write_kitti_trajectory(path: str, R_est: np.ndarray, t_est: np.ndarray):
    """KITTI 12-number-per-line pose file (reference
    utils/visualization.py:209-224 write_position equivalent)."""
    with open(path, "w") as f:
        for R, t in zip(R_est, t_est):
            m = np.concatenate([R, t.reshape(3, 1)], axis=1)
            f.write(" ".join(str(float(v)) for v in m.reshape(-1)) + "\n")
