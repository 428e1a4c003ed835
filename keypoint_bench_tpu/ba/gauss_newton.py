"""Bundle adjustment: Gauss-Newton with Schur-complement reduction, fully
on-device (the north-star capability beyond the reference, whose VO stops at
frame-to-frame essential-matrix chaining — tasks/visual_odometer.py:75-89).

Problem layout (fixed shapes, TPU-friendly):
  poses:   [C, 3, 3] R + [C, 3] t   (world -> camera)
  points:  [P, 3]
  obs:     cam_idx [N], pt_idx [N], uv [N, 2] pixels, mask [N]
  K:       [3, 3] shared intrinsics

Each GN iteration:
  * per-observation residuals + analytic Jacobians wrt the 6-dof left
    se3 perturbation of the camera and the 3-dof point (vmapped),
  * H_pp (3x3 per point), H_cc (6x6 per cam), H_cp blocks accumulated with
    segment-sum scatters over observations,
  * Schur complement S = H_cc - sum_p W_p Hpp^-1 W_p^T reduced camera system
    (6C x 6C dense solve; C is the keyframe-window size),
  * point back-substitution; damped (LM) updates; first camera gauge-fixed.

The distributed variant (ba/distributed.py) shards observations over the mesh
'data' axis and psums the reduced camera system.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST
_mm = functools.partial(jnp.matmul, precision=_HP)


@jax.tree_util.register_dataclass
@dataclass
class BAProblem:
    R: jnp.ndarray        # [C, 3, 3] world->cam rotations
    t: jnp.ndarray        # [C, 3]
    points: jnp.ndarray   # [P, 3]
    cam_idx: jnp.ndarray  # [N] int32
    pt_idx: jnp.ndarray   # [N] int32
    uv: jnp.ndarray       # [N, 2] pixel observations
    mask: jnp.ndarray     # [N] bool
    K: jnp.ndarray        # [3, 3]


def _hat(v):
    return jnp.array([[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]])


def _exp_so3(phi):
    """Rodrigues with Taylor-safe small-angle branch (double-where so
    autodiff through theta=0 stays finite — jacfwd runs through here in
    pose-graph optimization)."""
    th2 = jnp.sum(phi * phi)
    small = th2 < 1e-10
    th2_safe = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    Ph = _hat(phi)
    return jnp.eye(3) + A * Ph + B * _mm(Ph, Ph)


def _project(K, Xc):
    z = jnp.maximum(Xc[2], 1e-6)
    u = K[0, 0] * Xc[0] / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v])


def _residual_and_jac(K, R, t, X, uv):
    """r [2], J_cam [2,6] (left-perturbation, translation first), J_pt [2,3]."""
    Xc = _mm(R, X) + t
    z = jnp.maximum(Xc[2], 1e-6)
    r = _project(K, Xc) - uv
    fx, fy = K[0, 0], K[1, 1]
    # d(pi)/dXc
    Jpi = jnp.array([[fx / z, 0.0, -fx * Xc[0] / z ** 2],
                     [0.0, fy / z, -fy * Xc[1] / z ** 2]])
    # dXc/d(delta) for Xc' = exp(delta) o (R X + t): [I | -[Xc]x]
    Jcam = jnp.concatenate([Jpi, -_mm(Jpi, _hat(Xc))], axis=1)  # [2,6]
    Jpt = _mm(Jpi, R)
    return r, Jcam, Jpt


def reprojection_errors(prob: BAProblem):
    def one(ci, pi, uv):
        Xc = _mm(prob.R[ci], prob.points[pi]) + prob.t[ci]
        return jnp.linalg.norm(_project(prob.K, Xc) - uv)

    errs = jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv)
    return jnp.where(prob.mask, errs, 0.0)


@functools.partial(jax.jit, static_argnames=("iters", "fix_first_cam",
                                             "huber_delta"))
def ba_solve(prob: BAProblem, iters: int = 10, damping: float = 1e-4,
             fix_first_cam: bool = True, huber_delta: float = 0.0):
    """Run `iters` damped GN/Schur iterations. Returns updated (R, t, points,
    final mean reprojection error over valid observations). huber_delta > 0
    enables a robust (Huber) reweighting of each observation — essential when
    the observations come from real matching with outlier tracks."""
    C = prob.R.shape[0]
    P = prob.points.shape[0]
    wmask = prob.mask.astype(jnp.float32)

    def huber_cost(R, t, pts):
        def one(ci, pi, uv, m):
            Xc = _mm(R[ci], pts[pi]) + t[ci]
            rn = jnp.linalg.norm(_project(prob.K, Xc) - uv)
            if huber_delta > 0:
                return m * jnp.where(rn <= huber_delta, 0.5 * rn * rn,
                                     huber_delta * (rn - 0.5 * huber_delta))
            return m * 0.5 * rn * rn
        return jnp.sum(jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv,
                                     wmask))

    def iteration(state, _):
        R, t, pts, lam = state

        def per_obs(ci, pi, uv, m):
            r, Jc, Jp = _residual_and_jac(prob.K, R[ci], t[ci], pts[pi], uv)
            if huber_delta > 0:
                rn = jnp.linalg.norm(r) + 1e-12
                m = m * jnp.sqrt(jnp.minimum(1.0, huber_delta / rn))
            r = r * m
            Jc = Jc * m
            Jp = Jp * m
            return (r, Jc, Jp,
                    _mm(Jc.T, Jc), _mm(Jp.T, Jp), _mm(Jc.T, Jp),
                    _mm(Jc.T, r[:, None])[:, 0], _mm(Jp.T, r[:, None])[:, 0])

        (r, Jc, Jp, JcTJc, JpTJp, JcTJp, bc_o, bp_o) = jax.vmap(per_obs)(
            prob.cam_idx, prob.pt_idx, prob.uv, wmask)

        Hcc = jax.ops.segment_sum(JcTJc, prob.cam_idx, C)   # [C,6,6]
        Hpp = jax.ops.segment_sum(JpTJp, prob.pt_idx, P)    # [P,3,3]
        bc = -jax.ops.segment_sum(bc_o, prob.cam_idx, C)    # [C,6]
        bp = -jax.ops.segment_sum(bp_o, prob.pt_idx, P)     # [P,3]

        # LM damping with the adaptive lambda carried across iterations
        Hpp = Hpp + lam * jnp.eye(3)[None]
        Hcc = Hcc + lam * jnp.eye(6)[None]
        Hpp_inv = jnp.linalg.inv(Hpp)                        # [P,3,3]

        # Schur: S = Hcc_full - sum over obs-pairs of W Hpp^-1 W^T.
        # W rows live per (cam, point); accumulate the cross terms through
        # the observation list: for obs o: A_o = JcTJp_o; contribution to
        # S[cam_i, cam_j] needs all (i, j) sharing a point. Build per-point
        # U_p = sum_obs(JcTJp stacked into [C,6,3]) would be C*P — instead
        # exploit that each point's cameras interact pairwise; for
        # keyframe-window BA (C small) build T_p = Hpp_inv and accumulate
        # via dense [C,6,3] per point using segment_sum over a fused index.
        fused = prob.pt_idx * C + prob.cam_idx
        W = jax.ops.segment_sum(JcTJp, fused, P * C)         # [P*C, 6, 3]
        W = W.reshape(P, C, 6, 3)
        WH = jnp.einsum("pcij,pjk->pcik", W, Hpp_inv, precision=_HP)
        S_full = jnp.einsum("pcik,pdlk->cdil", WH, W, precision=_HP)
        # assemble [6C, 6C]
        S = jnp.zeros((C, C, 6, 6))
        S = S.at[jnp.arange(C), jnp.arange(C)].set(Hcc)
        S = S - S_full
        rhs = bc - jnp.einsum("pcik,pk->ci", WH, bp, precision=_HP)

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
        rd = rhs.reshape(6 * C)
        if fix_first_cam:
            # gauge fix by exact elimination: zero cam0's rows/cols, identity
            # diagonal, zero rhs (a huge-prior trick destroys f32
            # conditioning on real problems)
            Sd = Sd.at[:6, :].set(0.0).at[:, :6].set(0.0)
            Sd = Sd.at[:6, :6].set(jnp.eye(6))
            rd = rd.at[:6].set(0.0)
        dx = jnp.linalg.solve(Sd, rd).reshape(C, 6)

        # back-substitute points: dp = Hpp^-1 (bp - sum_c W^T dxc)
        Wt_dx = jnp.einsum("pcij,ci->pj", W, dx, precision=_HP)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dx, precision=_HP)

        # apply updates
        def upd(Rc, tc, d):
            Rn = _mm(_exp_so3(d[3:6]), Rc)
            tn = _mm(_exp_so3(d[3:6]), tc[:, None])[:, 0] + d[0:3]
            return Rn, tn

        Rn, tn = jax.vmap(upd)(R, t, dx)
        ptsn = pts + dp

        # Levenberg-Marquardt accept/reject: keep the step only if the
        # (robust) cost decreased; otherwise stay and raise lambda
        c_old = huber_cost(R, t, pts)
        c_new = huber_cost(Rn, tn, ptsn)
        accept = jnp.isfinite(c_new) & (c_new < c_old)

        R, t, pts = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old),
            (Rn, tn, ptsn), (R, t, pts))
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0), 1e-6, 1e6)
        return (R, t, pts, lam), None

    (Rf, tf, pf, _), _ = jax.lax.scan(
        iteration, (prob.R, prob.t, prob.points, jnp.asarray(damping)),
        None, length=iters)
    final = BAProblem(Rf, tf, pf, prob.cam_idx, prob.pt_idx, prob.uv,
                      prob.mask, prob.K)
    errs = reprojection_errors(final)
    mean_err = jnp.sum(errs) / jnp.maximum(jnp.sum(prob.mask), 1)
    return Rf, tf, pf, mean_err
