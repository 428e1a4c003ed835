"""Pose-graph optimization: loop-closure correction on a drifting chain."""
import numpy as np
import cv2
import jax.numpy as jnp

from keypoint_bench_tpu.ba.pose_graph import PoseGraph, pgo_solve


def _make_circle_graph(n=12, drift=0.03, seed=0):
    """Ground truth: poses around a circle. Odometry edges are noisy (drift);
    one loop-closure edge (last -> first) is exact."""
    rng = np.random.default_rng(seed)
    Rs_gt, ts_gt = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        Rk, _ = cv2.Rodrigues(np.array([0.0, 0.0, ang]))
        tk = np.array([np.cos(ang), np.sin(ang), 0.0]) * 3.0
        Rs_gt.append(Rk)
        ts_gt.append(tk)

    def rel(i, j):
        R = Rs_gt[j] @ Rs_gt[i].T
        t = ts_gt[j] - R @ ts_gt[i]
        return R, t

    ei, ej, mR, mt, w = [], [], [], [], []
    # noisy odometry chain
    for k in range(n - 1):
        R, t = rel(k, k + 1)
        dR, _ = cv2.Rodrigues(rng.normal(0, drift, 3))
        ei.append(k); ej.append(k + 1)
        mR.append(dR @ R); mt.append(t + rng.normal(0, drift * 3, 3))
        w.append(1.0)
    # exact loop closure
    R, t = rel(n - 1, 0)
    ei.append(n - 1); ej.append(0)
    mR.append(R); mt.append(t); w.append(3.0)

    # initialize by integrating the noisy odometry
    Rs0, ts0 = [Rs_gt[0]], [ts_gt[0]]
    for k in range(n - 1):
        R0, t0 = Rs0[-1], ts0[-1]
        # T_{k+1} = T_rel * T_k  (T maps world->cam? here poses are cam->world
        # style composition consistent with rel())
        Rn = mR[k] @ R0
        tn = mR[k] @ t0 + mt[k]
        Rs0.append(Rn)
        ts0.append(tn)

    g = PoseGraph(
        R=jnp.asarray(np.stack(Rs0), jnp.float32),
        t=jnp.asarray(np.stack(ts0), jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        meas_R=jnp.asarray(np.stack(mR), jnp.float32),
        meas_t=jnp.asarray(np.stack(mt), jnp.float32),
        weight=jnp.asarray(w, jnp.float32))
    return g, np.stack(Rs_gt), np.stack(ts_gt)


def test_pgo_reduces_trajectory_error():
    g, Rs_gt, ts_gt = _make_circle_graph()
    ate0 = np.linalg.norm(np.asarray(g.t) - ts_gt, axis=1).mean()
    Rf, tf, res = pgo_solve(g, iters=15)
    ate1 = np.linalg.norm(np.asarray(tf) - ts_gt, axis=1).mean()
    # loop closure redistributes the odometry drift: ATE halves or better
    assert ate1 < 0.6 * ate0, (ate0, ate1)


def test_pgo_exact_measurements_zero_residual():
    g, Rs_gt, ts_gt = _make_circle_graph(drift=0.0)
    Rf, tf, res = pgo_solve(g, iters=5)
    assert float(res) < 1e-4
