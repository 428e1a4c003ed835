"""Loop closure for monocular VO: place recognition + pose-graph correction.

Monocular closures are scale-ambiguous (an essential matrix gives unit
translation only, and degenerates entirely when the revisit is nearly
coincident), so this implements the classical robust recipe:

  * candidate pairs = non-adjacent frames whose descriptor sets mutually
    match strongly,
  * "strong" closures = candidates whose median match flow is tiny — the
    camera is back at (almost) the same pose; the relative rotation is
    estimated scale-free by Kabsch alignment of the matched bearing rays and
    the translation constraint is zero,
  * those edges feed pose-graph optimization (ba/pose_graph.py) to pull the
    drifted chain shut.

The reference's forward-only chaining (tasks/visual_odometer.py:81-89) can
never correct a past pose; this is the back-end it lacks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.ba.pose_graph import PoseGraph, pgo_solve
from keypoint_bench_tpu.ops.matching import mutual_nn_match


def _bearings(kpts_px, K):
    """Pixel coords [N,2] -> unit bearing rays [N,3]."""
    ph = np.concatenate([kpts_px, np.ones((len(kpts_px), 1))], axis=1)
    rays = ph @ np.linalg.inv(K).T
    return rays / np.linalg.norm(rays, axis=1, keepdims=True)


def _kabsch_rotation(b0, b1):
    """R minimizing ||b1 - R b0|| over rotations (bearing alignment —
    exact for a pure-rotation revisit)."""
    H = b0.T @ b1
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    return Vt.T @ S @ U.T


def detect_loop_closures(descs, valids, kpts_px, K, min_gap: int = 3,
                         min_matches: int = 80, max_flow_px: float = 4.0,
                         max_distance: float = 5.0):
    """Scan frame pairs with index gap >= min_gap; emit strong (near-
    coincident) closures as (i, j, R_ji, n_matches). descs [T][K,D],
    valids [T][K], kpts_px [T][K,2] numpy pixel coords."""
    t = len(descs)
    match_fn = jax.jit(lambda a, b, va, vb: mutual_nn_match(
        a, b, va, vb, max_distance))
    closures = []
    for i in range(t):
        for j in range(i + min_gap, t):
            nn01, ok = match_fn(descs[i], descs[j], valids[i], valids[j])
            okn = np.asarray(ok)
            n = int(okn.sum())
            if n < min_matches:
                continue
            p0 = kpts_px[i][okn]
            p1 = kpts_px[j][np.asarray(nn01)[okn]]
            flow = np.median(np.linalg.norm(p1 - p0, axis=1))
            if flow > max_flow_px:
                continue  # revisit with parallax: scale-ambiguous, skip
            R = _kabsch_rotation(_bearings(p0, K), _bearings(p1, K))
            closures.append((i, j, R, n))
    return closures


def optimize_with_closures(R_rel, t_rel, scales, closures, iters: int = 15,
                           closure_weight: float = 3.0):
    """Pose graph from the odometry chain plus zero-translation closure
    edges; returns optimized cam-from-world (R_w2c [T,3,3], t_w2c [T,3],
    final residual)."""
    t = len(scales)
    Rs = [np.eye(3)]
    ts = [np.zeros(3)]
    for i in range(1, t):
        s = scales[i] if scales[i] >= 0.001 else 0.0
        Rs.append(R_rel[i] @ Rs[-1])
        ts.append(R_rel[i] @ ts[-1] + s * t_rel[i])
    ei, ej, mR, mt, w = [], [], [], [], []
    for i in range(1, t):
        ei.append(i - 1)
        ej.append(i)
        mR.append(R_rel[i])
        mt.append(scales[i] * t_rel[i])
        w.append(1.0)
    for (i, j, R, n) in closures:
        ei.append(i)
        ej.append(j)
        mR.append(R)
        mt.append(np.zeros(3))
        w.append(closure_weight)
    g = PoseGraph(
        R=jnp.asarray(np.stack(Rs), jnp.float32),
        t=jnp.asarray(np.stack(ts), jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        meas_R=jnp.asarray(np.stack(mR), jnp.float32),
        meas_t=jnp.asarray(np.stack(mt), jnp.float32),
        weight=jnp.asarray(w, jnp.float32))
    Rf, tf, res = pgo_solve(g, iters=iters, damping=1e-4)
    return np.asarray(Rf), np.asarray(tf), float(res)
