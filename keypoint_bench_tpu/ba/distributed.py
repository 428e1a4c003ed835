"""Distributed bundle adjustment over a device mesh.

Landmarks (and all their observations) are partitioned across the 'data'
axis; each shard builds its local H_pp / W / Schur contributions, the reduced
6Cx6C camera system is psum-reduced over ICI, every shard solves it
redundantly (C is a keyframe window — tiny), and point back-substitution is
shard-local. This is the textbook distributed Schur reduction (SURVEY.md §5.7
north star) expressed as a shard_map with one psum group per GN iteration.

Round 4: the solver gained the single-chip ba_solve's robustness features —
Huber reweighting and Levenberg-Marquardt accept/reject with adaptive
lambda (the global robust cost is one extra scalar psum per iteration) — so
the VO windowed-BA path can refine on a mesh with the same semantics as
`ba/gauss_newton.ba_solve` (tasks/vo_ba.refine_window(mesh=...)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from keypoint_bench_tpu.ba.gauss_newton import (BAProblem, _residual_and_jac,
                                                _exp_so3, _mm, _project)

_HPP = jax.lax.Precision.HIGHEST

_AXIS = "data"


def partition_problem(prob: BAProblem, n_shards: int):
    """Host-side: group observations by point, assign points round-robin to
    shards, pad to equal sizes. Returns arrays with leading [n_shards] axis
    and local point indexing."""
    cam_idx = np.asarray(prob.cam_idx)
    pt_idx = np.asarray(prob.pt_idx)
    uv = np.asarray(prob.uv)
    mask = np.asarray(prob.mask)
    points = np.asarray(prob.points)
    Pn = points.shape[0]

    shard_of_pt = np.arange(Pn) % n_shards
    local_of_pt = np.arange(Pn) // n_shards
    p_local = int(np.ceil(Pn / n_shards))

    obs_shard = shard_of_pt[pt_idx]
    n_local = max(int(np.max(np.bincount(obs_shard, minlength=n_shards))), 1)

    s_pts = np.zeros((n_shards, p_local, 3), np.float32)
    s_cam = np.zeros((n_shards, n_local), np.int32)
    s_pt = np.zeros((n_shards, n_local), np.int32)
    s_uv = np.zeros((n_shards, n_local, 2), np.float32)
    s_mask = np.zeros((n_shards, n_local), bool)
    for s in range(n_shards):
        mine = np.where(shard_of_pt == s)[0]
        s_pts[s, local_of_pt[mine]] = points[mine]
        rows = np.where(obs_shard == s)[0]
        s_cam[s, : len(rows)] = cam_idx[rows]
        s_pt[s, : len(rows)] = local_of_pt[pt_idx[rows]]
        s_uv[s, : len(rows)] = uv[rows]
        s_mask[s, : len(rows)] = mask[rows]
    meta = {"shard_of_pt": shard_of_pt, "local_of_pt": local_of_pt,
            "p_local": p_local}
    return (jnp.asarray(s_pts), jnp.asarray(s_cam), jnp.asarray(s_pt),
            jnp.asarray(s_uv), jnp.asarray(s_mask)), meta


def gather_points(s_points, meta, n_points: int):
    """Invert the partitioning: [n_shards, p_local, 3] -> [P, 3]."""
    s_points = np.asarray(s_points)
    out = np.zeros((n_points, 3), np.float32)
    for p in range(n_points):
        out[p] = s_points[meta["shard_of_pt"][p], meta["local_of_pt"][p]]
    return out


def ba_solve_distributed(mesh, prob: BAProblem, iters: int = 10,
                         damping: float = 1e-4, fix_first_cam: bool = True,
                         huber_delta: float = 0.0):
    """Distributed GN/Schur BA with optional Huber robustness and LM
    accept/reject (same update semantics as ba_solve; float summation order
    differs across shards). Returns (R, t, sharded_points, meta)."""
    n_shards = mesh.shape[_AXIS]
    C = prob.R.shape[0]
    (s_pts, s_cam, s_pt, s_uv, s_mask), meta = partition_problem(prob,
                                                                 n_shards)
    K = prob.K
    p_local = s_pts.shape[1]

    def shard_fn(R, t, pts, cam_i, pt_i, uv, m):
        # local leading shard axis of size 1
        pts, cam_i, pt_i, uv, m = (pts[0], cam_i[0], pt_i[0], uv[0], m[0])
        wm = m.astype(jnp.float32)

        def local_cost(R, t, pts):
            """Shard-local robust cost (psum'd by the caller)."""
            def one(ci, pi, uvo, w):
                Xc = _mm(R[ci], pts[pi]) + t[ci]
                rn = jnp.linalg.norm(_project(K, Xc) - uvo)
                if huber_delta > 0:
                    return w * jnp.where(
                        rn <= huber_delta, 0.5 * rn * rn,
                        huber_delta * (rn - 0.5 * huber_delta))
                return w * 0.5 * rn * rn
            return jnp.sum(jax.vmap(one)(cam_i, pt_i, uv, wm))

        def iteration(state, _):
            R, t, pts, lam = state

            def per_obs(ci, pi, uvo, w):
                r, Jc, Jp = _residual_and_jac(K, R[ci], t[ci], pts[pi], uvo)
                if huber_delta > 0:
                    rn = jnp.linalg.norm(r) + 1e-12
                    w = w * jnp.sqrt(jnp.minimum(1.0, huber_delta / rn))
                r, Jc, Jp = r * w, Jc * w, Jp * w
                return (_mm(Jc.T, Jc), _mm(Jp.T, Jp), _mm(Jc.T, Jp),
                        _mm(Jc.T, r[:, None])[:, 0],
                        _mm(Jp.T, r[:, None])[:, 0])

            JcTJc, JpTJp, JcTJp, bc_o, bp_o = jax.vmap(per_obs)(
                cam_i, pt_i, uv, wm)

            Hcc_l = jax.ops.segment_sum(JcTJc, cam_i, C)
            Hpp = jax.ops.segment_sum(JpTJp, pt_i, p_local) \
                + lam * jnp.eye(3)[None]
            bc_l = -jax.ops.segment_sum(bc_o, cam_i, C)
            bp = -jax.ops.segment_sum(bp_o, pt_i, p_local)
            Hpp_inv = jnp.linalg.inv(Hpp)

            fused = pt_i * C + cam_i
            W = jax.ops.segment_sum(JcTJp, fused, p_local * C)
            W = W.reshape(p_local, C, 6, 3)
            WH = jnp.einsum("pcij,pjk->pcik", W, Hpp_inv, precision=_HPP)
            S_l = jnp.einsum("pcik,pdlk->cdil", WH, W, precision=_HPP)
            rhs_l = bc_l - jnp.einsum("pcik,pk->ci", WH, bp, precision=_HPP)

            # the one collective group: reduce camera system over shards
            Hcc = jax.lax.psum(Hcc_l, _AXIS) + lam * jnp.eye(6)[None]
            S_cross = jax.lax.psum(S_l, _AXIS)
            rhs = jax.lax.psum(rhs_l, _AXIS)

            S = jnp.zeros((C, C, 6, 6))
            S = S.at[jnp.arange(C), jnp.arange(C)].set(Hcc)
            S = S - S_cross
            Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
            rd = rhs.reshape(-1)
            if fix_first_cam:
                # exact gauge elimination (see ba_solve)
                Sd = Sd.at[:6, :].set(0.0).at[:, :6].set(0.0)
                Sd = Sd.at[:6, :6].set(jnp.eye(6))
                rd = rd.at[:6].set(0.0)
            dx = jnp.linalg.solve(Sd, rd).reshape(C, 6)

            Wt_dx = jnp.einsum("pcij,ci->pj", W, dx, precision=_HPP)
            dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dx, precision=_HPP)

            def upd(Rc, tc, d):
                Rot = _exp_so3(d[3:6])
                return _mm(Rot, Rc), _mm(Rot, tc[:, None])[:, 0] + d[0:3]

            Rn, tn = jax.vmap(upd)(R, t, dx)
            ptsn = pts + dp

            # LM accept/reject on the GLOBAL robust cost (scalar psums);
            # cameras are replicated, so `accept` agrees on every shard
            c_old = jax.lax.psum(local_cost(R, t, pts), _AXIS)
            c_new = jax.lax.psum(local_cost(Rn, tn, ptsn), _AXIS)
            accept = jnp.isfinite(c_new) & (c_new < c_old)
            R, t, pts = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old),
                (Rn, tn, ptsn), (R, t, pts))
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0),
                           1e-6, 1e6)
            return (R, t, pts, lam), None

        (Rf, tf, pf, _), _ = jax.lax.scan(
            iteration, (R, t, pts, jnp.asarray(damping, jnp.float32)), None,
            length=iters)
        return Rf, tf, pf[None]

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS)),
        out_specs=(P(), P(), P(_AXIS)))
    R, t, pts_sharded = jax.jit(mapped)(prob.R, prob.t, s_pts, s_cam, s_pt,
                                        s_uv, s_mask)
    return R, t, pts_sharded, meta
