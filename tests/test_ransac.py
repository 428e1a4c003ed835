"""RANSAC solver validation on synthetic geometry, cross-checked vs OpenCV."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.geometry.ransac import (
    ransac_homography, ransac_fundamental, ransac_essential, recover_pose,
    decompose_essential)


def make_homography_data(n=200, n_out=50, seed=0):
    rng = np.random.default_rng(seed)
    H = np.array([[1.1, 0.05, 20.0], [-0.03, 0.95, -10.0], [1e-4, -5e-5, 1.0]],
                 np.float32)
    p0 = rng.uniform(50, 450, (n, 2)).astype(np.float32)
    ph = np.concatenate([p0, np.ones((n, 1), np.float32)], axis=1)
    q = ph @ H.T
    p1 = q[:, :2] / q[:, 2:]
    p1 += rng.normal(0, 0.5, p1.shape).astype(np.float32)
    p1[:n_out] = rng.uniform(0, 500, (n_out, 2))  # outliers
    return H, p0, p1.astype(np.float32)


def test_ransac_homography_vs_cv2():
    H_true, p0, p1 = make_homography_data()
    mask = jnp.ones(p0.shape[0], bool)
    H_est, inl, ok = ransac_homography(jnp.asarray(p0), jnp.asarray(p1), mask,
                                       jax.random.key(0), n_hyp=512)
    assert bool(ok)
    H_est = np.asarray(H_est)
    # corner transfer error vs truth must be subpixel-ish
    corners = np.array([[0, 0, 1], [511, 0, 1], [0, 511, 1], [511, 511, 1]],
                       np.float32)
    for H in [H_est]:
        qt = corners @ H_true.T
        qe = corners @ H.T
        d = np.linalg.norm(qt[:, :2] / qt[:, 2:] - qe[:, :2] / qe[:, 2:],
                           axis=1)
        assert d.max() < 2.0, d
    # inlier count should be close to cv2's
    Hcv, mcv = cv2.findHomography(p0, p1, cv2.RANSAC)
    assert abs(int(np.asarray(inl).sum()) - int(mcv.sum())) < 15


def make_pose_data(n=300, n_out=60, seed=1):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    # random rotation + translation
    aa = rng.normal(0, 0.1, 3)
    R, _ = cv2.Rodrigues(aa)
    t = np.array([0.5, -0.2, 0.1])
    t = t / np.linalg.norm(t)
    X = np.concatenate([rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 10, (n, 1))],
                       axis=1)
    x0 = X @ K.T
    p0 = x0[:, :2] / x0[:, 2:]
    X1 = X @ R.T + t
    x1 = X1 @ K.T
    p1 = x1[:, :2] / x1[:, 2:]
    p0 += rng.normal(0, 0.3, p0.shape)
    p1 += rng.normal(0, 0.3, p1.shape)
    p1[:n_out] = rng.uniform(0, 640, (n_out, 2))
    return K, R, t, p0.astype(np.float32), p1.astype(np.float32)


def test_ransac_essential_recover_pose():
    K, R_true, t_true, p0, p1 = make_pose_data()
    p0n = (p0 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]]
    p1n = (p1 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]]
    mask = jnp.ones(p0.shape[0], bool)
    E, inl, ok = ransac_essential(jnp.asarray(p0n), jnp.asarray(p1n), mask,
                                  jax.random.key(1), n_hyp=1024,
                                  thresh=1.0 / 500.0)
    assert bool(ok)
    R, t, pm, cnt = recover_pose(E, jnp.asarray(p0n), jnp.asarray(p1n), inl)
    R = np.asarray(R); t = np.asarray(t)
    ang_R = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_true) - 1) / 2,
                                         -1, 1)))
    cos_t = abs(np.dot(t, t_true))
    ang_t = np.degrees(np.arccos(np.clip(cos_t, -1, 1)))
    assert ang_R < 1.0, ang_R
    assert ang_t < 2.0, ang_t
    assert int(cnt) > 200


def test_ransac_fundamental_inliers():
    K, R_true, t_true, p0, p1 = make_pose_data(seed=3)
    mask = jnp.ones(p0.shape[0], bool)
    F, inl, ok = ransac_fundamental(jnp.asarray(p0), jnp.asarray(p1), mask,
                                    jax.random.key(2), n_hyp=512, thresh=3.0)
    assert bool(ok)
    # epipolar constraint satisfied for true correspondences
    inl = np.asarray(inl)
    assert inl[60:].mean() > 0.9       # inliers recovered
    assert inl[:60].mean() < 0.3       # outliers rejected


def test_decompose_essential_roundtrip():
    rng = np.random.default_rng(5)
    aa = rng.normal(0, 0.4, 3)
    R_true, _ = cv2.Rodrigues(aa)
    t_true = rng.normal(0, 1, 3)
    t_true /= np.linalg.norm(t_true)
    tx = np.array([[0, -t_true[2], t_true[1]],
                   [t_true[2], 0, -t_true[0]],
                   [-t_true[1], t_true[0], 0]])
    E = tx @ R_true
    R1, R2, t = decompose_essential(jnp.asarray(E, dtype=jnp.float32))
    opts = []
    for R in [np.asarray(R1), np.asarray(R2)]:
        opts.append(np.degrees(np.arccos(np.clip((np.trace(R.T @ R_true) - 1)
                                                 / 2, -1, 1))))
    assert min(opts) < 1e-2
    assert min(np.linalg.norm(np.asarray(t) - t_true),
               np.linalg.norm(np.asarray(t) + t_true)) < 1e-3
