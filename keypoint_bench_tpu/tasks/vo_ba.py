"""VO -> bundle adjustment: grow frame-to-frame visual odometry into windowed
BA (the BASELINE.json north star — the reference's VO never revisits a pose
after GT-scale chaining, tasks/visual_odometer.py:81-89).

Pipeline:
  1. consecutive-pair brute-force matches are chained into multi-frame
     tracks host-side (track ids propagate along match edges),
  2. each track is triangulated linearly from its first and last observation
     using the chained VO poses,
  3. a BAProblem over the window refines poses + points with the
     Gauss-Newton/Schur solver (ba/gauss_newton.py), first camera fixed.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.ba.gauss_newton import BAProblem, ba_solve, \
    reprojection_errors


def chain_tracks(match_idx: np.ndarray, match_ok: np.ndarray):
    """match_idx [T, K]: for pair (i-1, i), row i maps keypoint slot k of
    frame i-1 to its matched slot in frame i (with match_ok [T, K] validity;
    row 0 is ignored). Returns a list of tracks, each a list of
    (frame, slot) observations with length >= 2.

    Vectorized per frame (round-3 verdict item 4: the per-(frame, slot)
    Python loop was O(T*K) interpreter steps — untenable at KITTI length).
    Semantics match the naive loop exactly: per frame, the lowest valid
    slot claiming a target j wins it ("first claim wins"); losers' would-be
    singleton tracks are observationally invisible (their (i-1, slot) cell
    is never read again and len>=2 filters them), so only winners matter.
    Track ids are assigned in (frame, slot) order, preserving the naive
    loop's output order."""
    t, k = np.asarray(match_idx).shape
    match_idx = np.asarray(match_idx)
    match_ok = np.asarray(match_ok, bool)
    track_of = -np.ones((t, k), np.int64)   # track id per (frame, slot)
    next_id = 0
    for i in range(1, t):
        slots = np.nonzero(match_ok[i])[0]
        if slots.size == 0:
            continue
        j = match_idx[i].astype(np.int64)
        # lowest slot per distinct target j wins (np.unique's return_index
        # picks the first occurrence; slots is ascending)
        _, first = np.unique(j[slots], return_index=True)
        winners = np.sort(slots[first])
        tid = track_of[i - 1, winners].copy()
        new = tid < 0
        tid[new] = next_id + np.arange(int(new.sum()))
        next_id += int(new.sum())
        track_of[i - 1, winners[new]] = tid[new]
        track_of[i, j[winners]] = tid
    rows, cols = np.nonzero(track_of >= 0)
    if rows.size == 0:
        return []
    tids = track_of[rows, cols]
    order = np.lexsort((rows, tids))        # by track id, frames ascending
    rt, rr, rc = tids[order], rows[order], cols[order]
    bounds = np.flatnonzero(np.diff(rt)) + 1
    tracks = [list(zip(r.tolist(), c.tolist()))
              for r, c in zip(np.split(rr, bounds), np.split(rc, bounds))]
    return [tr for tr in tracks if len(tr) >= 2]


def build_ba_problem(kpts_px: np.ndarray, tracks, R_w2c: np.ndarray,
                     t_w2c: np.ndarray, K: np.ndarray,
                     min_depth: float = 0.1, max_depth: float = 100.0):
    """kpts_px [T, Kslots, 2] pixel coords; tracks from chain_tracks;
    R_w2c/t_w2c [T,...] world->camera chained VO poses. Returns (BAProblem,
    n_points) — n_points is the REAL landmark count before bucket padding —
    or None if too few valid tracks.

    Fully vectorized (round 4): triangulation is one batched 4x4
    np.linalg.svd over all tracks and the observation lists are array ops —
    the per-track Python loop with a scalar SVD each cost seconds per
    KITTI-scale window."""
    n_tracks = len(tracks)
    if n_tracks == 0:
        return None
    lens = np.array([len(tr) for tr in tracks])
    flat = np.array([obs for tr in tracks for obs in tr], np.int64)
    tids = np.repeat(np.arange(n_tracks), lens)
    fr, sl = flat[:, 0], flat[:, 1]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    ends = np.cumsum(lens) - 1
    f0, s0 = fr[starts], sl[starts]
    f1, s1 = fr[ends], sl[ends]

    # batched linear two-view triangulation from each track's first/last obs
    P = K @ np.concatenate([R_w2c, t_w2c[:, :, None]], axis=2)   # [C, 3, 4]
    P0, P1 = P[f0], P[f1]
    uv0 = kpts_px[f0, s0]
    uv1 = kpts_px[f1, s1]
    A = np.stack([
        uv0[:, 0, None] * P0[:, 2] - P0[:, 0],
        uv0[:, 1, None] * P0[:, 2] - P0[:, 1],
        uv1[:, 0, None] * P1[:, 2] - P1[:, 0],
        uv1[:, 1, None] * P1[:, 2] - P1[:, 1],
    ], axis=1)                                                   # [T, 4, 4]
    _, _, vt = np.linalg.svd(A)
    Xh = vt[:, -1, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        X = Xh[:, :3] / Xh[:, 3:4]
    z0 = np.einsum("tij,tj->ti", R_w2c[f0], np.nan_to_num(X, nan=0.0,
                                                          posinf=0.0,
                                                          neginf=0.0))[:, 2] \
        + t_w2c[f0][:, 2]
    good = ((z0 > min_depth) & (z0 < max_depth)
            & np.isfinite(X).all(axis=1))
    if int(good.sum()) < 8:
        return None
    pid_of = -np.ones(n_tracks, np.int64)
    pid_of[good] = np.arange(int(good.sum()))
    keep = good[tids]
    points3d = list(X[good])
    cams = fr[keep].tolist()
    pt_ids = pid_of[tids[keep]].tolist()
    uvs = list(kpts_px[fr[keep], sl[keep]])

    def _bucket(n: int, quantum: int = 256) -> int:
        # pad counts to GEOMETRIC buckets (powers of two above `quantum`)
        # so ba_solve's jit doesn't retrace per window. Arithmetic
        # 256-quantum buckets were not enough: observation counts depend on
        # the pose-dependent triangulation depth gate, which jitters a few
        # hundred obs run-to-run and straddled bucket boundaries — a fresh
        # ~5.5 s remote compile per VO run (measured round 5,
        # ba_solve._cache_size() grew per run). Power-of-two buckets absorb
        # that jitter and bound total distinct compiles logarithmically.
        b = quantum
        while b < n:
            b *= 2
        return b

    n_obs = len(cams)
    n_pts = len(points3d)
    # bucket from the POSE-INDEPENDENT upper bounds (all track observations
    # / all tracks), not the depth-gated counts: the gate depends on the
    # RANSAC-key-dependent chained poses, so gated counts jitter across
    # runs and straddle any bucket scheme — every VO run recompiled
    # ba_solve (~5 s through the remote helper, measured round 5 via
    # ba_solve._cache_size()). Given the same matches, these shapes are
    # deterministic; the extra rows are masked out.
    p_obs = _bucket(int(lens.sum()))
    p_pts = _bucket(n_tracks, 64)
    pts_arr = np.concatenate(
        [np.stack(points3d),
         np.tile(np.array([0.0, 0.0, 5.0]), (p_pts - n_pts, 1))]) \
        if p_pts > n_pts else np.stack(points3d)
    pad_obs = p_obs - n_obs
    prob = BAProblem(
        R=jnp.asarray(R_w2c, jnp.float32),
        t=jnp.asarray(t_w2c, jnp.float32),
        points=jnp.asarray(pts_arr, jnp.float32),
        cam_idx=jnp.asarray(np.pad(np.asarray(cams, np.int32),
                                   (0, pad_obs)), jnp.int32),
        pt_idx=jnp.asarray(np.pad(np.asarray(pt_ids, np.int32),
                                  (0, pad_obs)), jnp.int32),
        uv=jnp.asarray(np.pad(np.stack(uvs), ((0, pad_obs), (0, 0))),
                       jnp.float32),
        mask=jnp.asarray(np.arange(p_obs) < n_obs),
        K=jnp.asarray(K, jnp.float32))
    return prob, n_pts


@jax.jit
def _gate_window(prob: BAProblem, max_init_err):
    """Initial-reprojection gating + gated mean error as ONE jitted call.

    The eager form (two `reprojection_errors` calls around a host float())
    re-traced its vmap closure with fresh array constants on every
    refine_window call, which through the axon remote-compile helper cost
    12-15 s per VO run (measured round 5, tools/probe_ba_slow.py: the same
    values through a cached executable cost 30 ms). Keeping `prob` an
    argument keys the jit cache on shapes, not array identity."""
    errs = reprojection_errors(prob)
    m = prob.mask & (errs < max_init_err)
    err0 = jnp.sum(errs * m) / jnp.maximum(jnp.sum(m), 1)
    return m, err0


@jax.jit
def _masked_mean_err(prob: BAProblem):
    errs = reprojection_errors(prob)
    return jnp.sum(errs) / jnp.maximum(jnp.sum(prob.mask), 1)


def refine_window(kpts_px, tracks, R_w2c, t_w2c, K, iters: int = 8,
                  max_init_err: float = 20.0, huber_delta: float = 2.0,
                  mesh=None):
    """Run windowed BA; returns (R, t, points, err_before, err_after) or None
    when the window has too few tracks. Observations whose initial
    reprojection error exceeds `max_init_err` px (wrong matches in the
    tracks) are masked out; the solve itself uses Huber reweighting.

    With `mesh`, the window refines through the distributed Schur solver
    (ba/distributed.py) — landmarks partitioned over the mesh 'data' axis,
    camera system psum-reduced — with the same Huber + LM semantics as the
    single-chip path (equality test: tests/test_vo_ba.py)."""
    import os as _os
    import time as _time
    _timing = _os.environ.get("KBT_VO_TIMING", "0") == "1"
    _t0 = _time.perf_counter()

    def _mark(lbl):
        nonlocal _t0
        if _timing:
            t1 = _time.perf_counter()
            print(f"[refine timing] {lbl}={(t1 - _t0) * 1e3:.0f}ms")
            _t0 = t1

    built = build_ba_problem(kpts_px, tracks, R_w2c, t_w2c, K)
    _mark("build")
    if built is None:
        return None
    prob, n_pts = built
    inlier_mask, err0_dev = _gate_window(prob,
                                         jnp.asarray(max_init_err,
                                                     jnp.float32))
    prob = BAProblem(prob.R, prob.t, prob.points, prob.cam_idx, prob.pt_idx,
                     prob.uv, inlier_mask, prob.K)
    err0 = float(err0_dev)
    _mark("gate+err0")
    if mesh is not None:
        from keypoint_bench_tpu.ba.distributed import (ba_solve_distributed,
                                                       gather_points)
        R, t, pts_sh, meta = ba_solve_distributed(
            mesh, prob, iters=iters, damping=1e-2, huber_delta=huber_delta)
        p = gather_points(pts_sh, meta, int(prob.points.shape[0]))
        final = BAProblem(R, t, jnp.asarray(p), prob.cam_idx, prob.pt_idx,
                          prob.uv, inlier_mask, prob.K)
        err = float(_masked_mean_err(final))
        # slice off the bucket-padding phantom landmarks before returning
        return np.asarray(R), np.asarray(t), np.asarray(p)[:n_pts], err0, err
    R, t, p, err = ba_solve(prob, iters=iters, damping=1e-2,
                            huber_delta=huber_delta)
    if _timing:
        try:
            sig = {f.name: (getattr(prob, f.name).shape,
                            str(getattr(prob, f.name).dtype))
                   for f in prob.__dataclass_fields__.values()}
            print(f"[refine timing] ba_solve cache_size="
                  f"{ba_solve._cache_size()} gate cache_size="
                  f"{_gate_window._cache_size()} sig={sig}")
        except Exception as e:
            print(f"[refine timing] sig fail {e}")
    _mark("ba_solve_dispatch")
    out = (np.asarray(R), np.asarray(t), np.asarray(p)[:n_pts], err0,
           float(err))
    _mark("ba_solve_sync")
    return out
