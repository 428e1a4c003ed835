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


def detect_loop_closures_scaled(descs, valids, kpts_px, K, R_rel, t_rel,
                                scales, key, min_gap: int = 4,
                                min_matches: int = 60,
                                strong_flow_px: float = 4.0,
                                scaled_flow_px: float = 60.0,
                                max_distance: float = 5.0,
                                min_depth_pts: int = 15,
                                n_hyp: int = 1024,
                                reproj_tol_px: float = 5.0,
                                min_parallax_rad: float = 0.04,
                                prior_gate_abs: float = 0.3,
                                prior_gate_per_edge: float = 0.06,
                                prior_rot_gate: float = 0.35,
                                images=None):
    """Loop closures including parallax revisits (metric translation).

    Near-coincident revisits get the zero-translation Kabsch edge (as
    detect_loop_closures). Revisits with real parallax additionally recover a
    *metric* closure: essential RANSAC gives (R_ji, unit t); the scale comes
    from the odometry map — frame i's matched keypoints are triangulated
    against its odometry neighbour (known scaled relative pose), and each
    depth votes for the closure scale via the epipolar transfer equation
    u_j x (R z u_i + s t) = 0. The median positive vote wins; closures with
    too few depth votes or >50% MAD spread are rejected.

    Returns list of (i, j, R_ji, t_ji [3], n_matches); t_ji is zeros for
    strong closures. Conventions match optimize_with_closures: X_j = R X_i + t.

    `images` (optional, [T] of [H,W,C] float arrays): when given, the
    neighbour correspondences that anchor the map depths come from pyramidal
    LK tracking instead of descriptor matching — local tracking is immune to
    the repeated-structure descriptor aliasing that poisons wide-baseline
    matching (real systems track their map points for the same reason).
    """
    import jax.random as jrandom
    from keypoint_bench_tpu.geometry.ransac import (_triangulate_depths,
                                                    ransac_essential,
                                                    recover_pose)

    t = len(descs)
    match_fn = jax.jit(lambda a, b, va, vb: mutual_nn_match(
        a, b, va, vb, max_distance))
    ess_fn = jax.jit(lambda p0, p1, m, k: ransac_essential(
        p0, p1, m, k, n_hyp=n_hyp, thresh=2.0 / float(K[0, 0])))
    Kinv = np.linalg.inv(K)
    fx = float(K[0, 0])

    def rays_h(px):
        """Pixel coords -> homogeneous camera rays (x, y, 1)."""
        ph = np.concatenate([px, np.ones((len(px), 1))], axis=1)
        r = ph @ Kinv.T
        return r / r[:, 2:3]

    depth_cache = {}

    def frame_depths(i):
        """Depth (z, camera-i frame) per keypoint of frame i, NaN where
        unknown, from odometry-neighbour triangulation."""
        if i in depth_cache:
            return depth_cache[i]
        z = np.full(len(kpts_px[i]), np.nan)
        nb = i + 1 if i + 1 < t else i - 1
        s_nb = scales[nb] if nb == i + 1 else scales[i]
        if s_nb >= 1e-3:
            if images is not None:
                from keypoint_bench_tpu.ops.lk import LKParams, optical_flow
                h_im, w_im = np.asarray(images[i]).shape[:2]
                sc = np.array([w_im - 1.0, h_im - 1.0])
                pts01 = jnp.asarray(kpts_px[i] / sc, jnp.float32)
                tracked, lk_err = optical_flow(
                    jnp.asarray(images[i], jnp.float32),
                    jnp.asarray(images[nb], jnp.float32),
                    pts01, pts01, jax.random.key(i),
                    LKParams(distance=10.0, win_size=21, levels=3,
                             iterations=40))
                okn = np.asarray(lk_err) < 4.0
                nbr_px = np.asarray(tracked) * sc
                nn = None
            else:
                nn_j, ok = match_fn(descs[i], descs[nb], valids[i],
                                    valids[nb])
                okn = np.asarray(ok)
                nn = np.asarray(nn_j)
            if okn.sum() >= 8:
                if nb == i + 1:
                    R = np.asarray(R_rel[nb])
                    tv = float(scales[nb]) * np.asarray(t_rel[nb])
                else:  # pose of (i-1) from i = inverse of (i from i-1)
                    R = np.asarray(R_rel[i]).T
                    tv = -R @ (float(scales[i]) * np.asarray(t_rel[i]))
                u_i = rays_h(kpts_px[i][okn])
                u_n = rays_h(nbr_px[okn] if nn is None
                             else kpts_px[nb][nn[okn]])
                z0, z1 = _triangulate_depths(jnp.asarray(R, jnp.float32),
                                             jnp.asarray(tv, jnp.float32),
                                             jnp.asarray(u_i, jnp.float32),
                                             jnp.asarray(u_n, jnp.float32))
                z0 = np.asarray(z0)
                # triangulation-quality gate on MEASURED parallax: the angle
                # between the rotation-compensated rays. Low-parallax points
                # (the far background) don't triangulate to large z under
                # noise — they triangulate to arbitrary small z, so a depth
                # cut cannot catch them; the ray angle can.
                ui_n = u_i / np.linalg.norm(u_i, axis=1, keepdims=True)
                un_n = u_n / np.linalg.norm(u_n, axis=1, keepdims=True)
                rot_comp = ui_n @ R.T
                cosp = np.clip(np.sum(rot_comp * un_n, axis=1), -1, 1)
                parallax = np.arccos(cosp)
                good = (z0 > 0) & (np.asarray(z1) > 0) \
                    & (parallax > min_parallax_rad)
                zz = np.full(int(okn.sum()), np.nan)
                zz[good] = z0[good]
                z[okn] = zz
        depth_cache[i] = z
        return z

    def refine_closure(R0, t0, Xi, obs_px, iters=10, huber_px=3.0):
        """Motion-only Gauss-Newton: polish (R, t) of the closure edge by
        minimizing Huber-weighted reprojection of the depth-scaled points
        Xi (frame-i camera coords) into frame j. The essential-matrix
        direction error is the dominant closure noise; reprojection with
        metric depths pins both direction and scale."""
        R0 = R0.copy()
        t0 = t0.copy()
        fxy = np.array([K[0, 0], K[1, 1]])
        for _ in range(iters):
            Xj = Xi @ R0.T + t0
            zj = np.maximum(Xj[:, 2:3], 1e-6)
            proj = Xj[:, :2] / zj * fxy + K[:2, 2]
            r = proj - obs_px                         # [N, 2]
            rn = np.linalg.norm(r, axis=1)
            wgt = np.where(rn <= huber_px, 1.0,
                           np.sqrt(huber_px / np.maximum(rn, 1e-9)))
            # d proj / d Xj
            iz = 1.0 / zj[:, 0]
            Jp = np.zeros((len(Xi), 2, 3))
            Jp[:, 0, 0] = fxy[0] * iz
            Jp[:, 0, 2] = -fxy[0] * Xj[:, 0] * iz * iz
            Jp[:, 1, 1] = fxy[1] * iz
            Jp[:, 1, 2] = -fxy[1] * Xj[:, 1] * iz * iz
            # d Xj / d [omega, dt]: -[R Xi]_x for left-perturbed rotation, I
            RXi = Xi @ R0.T
            Jx = np.zeros((len(Xi), 3, 6))
            Jx[:, 0, 1] = RXi[:, 2]
            Jx[:, 0, 2] = -RXi[:, 1]
            Jx[:, 1, 0] = -RXi[:, 2]
            Jx[:, 1, 2] = RXi[:, 0]
            Jx[:, 2, 0] = RXi[:, 1]
            Jx[:, 2, 1] = -RXi[:, 0]
            Jx[:, :, 3:] = np.eye(3)
            J = np.einsum("nij,njk->nik", Jp, Jx).reshape(-1, 6)
            rw = (r * wgt[:, None]).reshape(-1)
            Jw = J * np.repeat(wgt, 2)[:, None]
            H = Jw.T @ Jw + 1e-6 * np.eye(6)
            g = Jw.T @ rw
            d = np.linalg.solve(H, -g)
            w_ = d[:3]
            th = np.linalg.norm(w_)
            if th > 1e-12:
                k_ = w_ / th
                Kx = np.array([[0, -k_[2], k_[1]], [k_[2], 0, -k_[0]],
                               [-k_[1], k_[0], 0]])
                dR = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
                R0 = dR @ R0
            t0 = t0 + d[3:]
        Xj = Xi @ R0.T + t0
        proj = Xj[:, :2] / np.maximum(Xj[:, 2:3], 1e-6) * fxy + K[:2, 2]
        med = float(np.median(np.linalg.norm(proj - obs_px, axis=1)))
        return R0, t0, med

    # odometry-chain prior for drift-envelope (chi^2-style) gating: a
    # closure measurement must land within the drift envelope of the chain
    # prediction, which widens with the edge gap — a repeated-structure
    # scene can produce coherent-but-wrong match sets that survive every
    # image-space check, but they claim relative poses far outside any
    # plausible accumulated drift
    Rs_chain = [np.eye(3)]
    ts_chain = [np.zeros(3)]
    for k in range(1, t):
        sk = scales[k] if scales[k] >= 1e-3 else 0.0
        Rs_chain.append(np.asarray(R_rel[k]) @ Rs_chain[-1])
        ts_chain.append(np.asarray(R_rel[k]) @ ts_chain[-1]
                        + sk * np.asarray(t_rel[k]))

    def prior_rel(ii, jj):
        R_p = Rs_chain[jj] @ Rs_chain[ii].T
        t_p = ts_chain[jj] - R_p @ ts_chain[ii]
        return R_p, t_p

    closures = []
    for i in range(t):
        for j in range(i + min_gap, t):
            nn01, ok = match_fn(descs[i], descs[j], valids[i], valids[j])
            okn = np.asarray(ok)
            n = int(okn.sum())
            if n < min_matches:
                continue
            nn = np.asarray(nn01)
            p0 = kpts_px[i][okn]
            p1 = kpts_px[j][nn[okn]]
            flow = np.median(np.linalg.norm(p1 - p0, axis=1))
            if flow <= strong_flow_px:
                R = _kabsch_rotation(_bearings(p0, K), _bearings(p1, K))
                closures.append((i, j, R, np.zeros(3), n))
                continue
            if flow > scaled_flow_px:
                # not a revisit, just far-away covisibility: the closure
                # scale rests on map depths whose bias is invisible to the
                # (scale-invariant) reprojection check — skip
                continue
            # parallax revisit: metric closure from E + map depths
            p0n_all = (kpts_px[i] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
            p1n_all = (kpts_px[j][nn] - K[:2, 2]) / np.array(
                [K[0, 0], K[1, 1]])
            key, sub = jrandom.split(key)
            E, inl, ok_e = ess_fn(jnp.asarray(p0n_all, jnp.float32),
                                  jnp.asarray(p1n_all, jnp.float32),
                                  jnp.asarray(okn), sub)
            # an honest closure keeps most of its matches on the epipolar
            # geometry; a low ratio means RANSAC fit a contaminated set
            if not bool(ok_e) or int(np.asarray(inl).sum()) < 0.6 * n:
                continue
            R, tj, pmask, cnt = recover_pose(
                E, jnp.asarray(p0n_all, jnp.float32),
                jnp.asarray(p1n_all, jnp.float32), inl)
            R = np.asarray(R)
            tj = np.asarray(tj)
            pm = np.asarray(pmask)
            z = frame_depths(i)
            sel = pm & np.isfinite(z)
            if int(sel.sum()) < min_depth_pts:
                continue
            u_i = rays_h(kpts_px[i][sel])
            u_j = rays_h(kpts_px[j][nn[sel]])
            # u_j x (R (z u_i) + s t) = 0  ->  s per point by least squares
            a = np.cross(u_j, np.broadcast_to(tj, u_j.shape))
            b = np.cross(u_j, (z[sel, None] * u_i) @ R.T)
            denom = np.sum(a * a, axis=1)
            s_votes = -np.sum(a * b, axis=1) / np.maximum(denom, 1e-12)
            s_votes = s_votes[(s_votes > 1e-3) & np.isfinite(s_votes)
                              & (denom > 1e-8)]
            if len(s_votes) < min_depth_pts:
                continue
            s = float(np.median(s_votes))
            mad = float(np.median(np.abs(s_votes - s)))
            if mad > 0.5 * s:
                continue  # inconsistent depth votes
            # polish (R, t) against the metric points. Seeding matters: the
            # E-based pose sits near the translation-rotation ambiguity
            # valley (narrow FOV, small baseline) and GN from it can
            # collapse t -> 0; the odometry prior is within drift of the
            # truth, i.e. in the right basin.
            R_p, t_p = prior_rel(i, j)
            Xi = z[sel, None] * u_i
            Rr, tr, med_px = refine_closure(R_p, t_p, Xi,
                                            kpts_px[j][nn[sel]])
            if med_px > reproj_tol_px:
                continue
            gate = prior_gate_abs + prior_gate_per_edge * (j - i)
            cosr = np.clip((np.trace(Rr.T @ R_p) - 1) / 2, -1, 1)
            if np.linalg.norm(tr - t_p) > gate or \
                    np.arccos(cosr) > prior_rot_gate + 0.03 * (j - i):
                continue  # outside the drift envelope of the odometry prior
            closures.append((i, j, Rr, tr, n))
    return closures


def optimize_with_closures(R_rel, t_rel, scales, closures, iters: int = 15,
                           closure_weight: float = 3.0,
                           scaled_closure_weight: float = 1.0):
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
    for cl in closures:
        if len(cl) == 4:        # legacy strong closure (i, j, R, n)
            i, j, R, _n = cl
            tv = np.zeros(3)
        else:                   # scaled closure (i, j, R, t, n)
            i, j, R, tv, _n = cl
        ei.append(i)
        ej.append(j)
        mR.append(R)
        mt.append(np.asarray(tv, np.float64))
        # near-coincident (zero-translation) closures are nearly exact;
        # scaled parallax closures carry E-direction + map-depth noise and
        # get a weight on par with an odometry edge
        strong = float(np.linalg.norm(np.asarray(tv))) < 1e-9
        w.append(closure_weight if strong else scaled_closure_weight)
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
