"""Pose-graph optimization: Gauss-Newton over SE3 poses with relative-pose
constraints (the second half of the BASELINE.json north star: "bundle
adjustment and pose-graph optimization"; absent from the reference, whose VO
never revisits a pose after chaining, tasks/visual_odometer.py:81-89).

Residual per edge (i, j) with measurement T_ij (i -> j):
    r = Log( T_ij^-1 * (T_j * T_i^-1) )   in R^6 (translation, rotation)
Jacobians are taken by autodiff of the residual wrt the left-multiplied
tangent perturbations of T_i and T_j (exact at the linearization point).
The normal system over all poses is assembled with segment-sums and solved
densely (pose counts are keyframe-scale), first pose gauge-fixed.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ba.gauss_newton import _exp_so3, _mm

_HP = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclass
class PoseGraph:
    R: jnp.ndarray        # [N, 3, 3]
    t: jnp.ndarray        # [N, 3]
    edge_i: jnp.ndarray   # [E] int32
    edge_j: jnp.ndarray   # [E] int32
    meas_R: jnp.ndarray   # [E, 3, 3] measured R of T_ij (i -> j)
    meas_t: jnp.ndarray   # [E, 3]
    weight: jnp.ndarray   # [E] scalar information weight


def _log_so3(R):
    """SO3 log with a Taylor-safe small-angle branch (double-where: arccos'
    diverges at cos=1, which is exactly the linearization point of a
    converged pose graph)."""
    c = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
    small = c > 1.0 - 1e-7
    c_safe = jnp.where(small, 0.0, c)
    th = jnp.arccos(c_safe)
    s_exact = th / (2.0 * jnp.sin(th) + 1e-12)
    s_taylor = 0.5 + (1.0 - c) / 6.0  # theta/(2 sin theta) ~ 1/2 + th^2/12
    s = jnp.where(small, s_taylor, s_exact)
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return s * w


def _apply_tangent(R, t, d):
    """Left perturbation: (exp(phi) R, exp(phi) t + rho)."""
    Rot = _exp_so3(d[3:6])
    return _mm(Rot, R), _mm(Rot, t[:, None])[:, 0] + d[0:3]


def _edge_residual(Ri, ti, Rj, tj, mR, mt, di, dj):
    """Residual of one edge after tangent perturbations di, dj (autodiffed)."""
    Ri, ti = _apply_tangent(Ri, ti, di)
    Rj, tj = _apply_tangent(Rj, tj, dj)
    # relative j-from-i: T_j * T_i^-1
    R_rel = _mm(Rj, Ri.T)
    t_rel = tj - _mm(R_rel, ti[:, None])[:, 0]
    # error transform: meas^-1 * rel
    R_err = _mm(mR.T, R_rel)
    t_err = _mm(mR.T, (t_rel - mt)[:, None])[:, 0]
    return jnp.concatenate([t_err, _log_so3(R_err)])


@functools.partial(jax.jit, static_argnames=("iters",))
def pgo_solve(g: PoseGraph, iters: int = 10, damping: float = 1e-6):
    """Run GN iterations; returns (R, t, final mean residual norm)."""
    n = g.R.shape[0]
    zero6 = jnp.zeros(6)

    def iteration(state, _):
        R, t = state

        def per_edge(i, j, mR, mt, w):
            f = lambda di, dj: _edge_residual(R[i], t[i], R[j], t[j], mR, mt,
                                              di, dj)
            r = f(zero6, zero6)
            Ji = jax.jacfwd(f, argnums=0)(zero6, zero6)
            Jj = jax.jacfwd(f, argnums=1)(zero6, zero6)
            return r * w, Ji * w, Jj * w

        r, Ji, Jj = jax.vmap(per_edge)(g.edge_i, g.edge_j, g.meas_R,
                                       g.meas_t, g.weight)

        # assemble H [6n, 6n], b [6n] with scatter-adds over edges
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji, precision=_HP)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj, precision=_HP)
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj, precision=_HP)
        bi = -jnp.einsum("eki,ek->ei", Ji, r, precision=_HP)
        bj = -jnp.einsum("eki,ek->ei", Jj, r, precision=_HP)

        H = jnp.zeros((n, n, 6, 6))
        H = H.at[g.edge_i, g.edge_i].add(Hii)
        H = H.at[g.edge_j, g.edge_j].add(Hjj)
        H = H.at[g.edge_i, g.edge_j].add(Hij)
        H = H.at[g.edge_j, g.edge_i].add(Hij.transpose(0, 2, 1))
        b = jnp.zeros((n, 6))
        b = b.at[g.edge_i].add(bi)
        b = b.at[g.edge_j].add(bj)

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        Hd = Hd + damping * jnp.eye(6 * n)
        # gauge fix by exact elimination of pose 0
        Hd = Hd.at[:6, :].set(0.0).at[:, :6].set(0.0)
        Hd = Hd.at[:6, :6].set(jnp.eye(6))
        b = b.at[0].set(jnp.zeros(6))
        dx = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(n, 6)

        Rn, tn = jax.vmap(_apply_tangent)(R, t, dx)
        return (Rn, tn), None

    (Rf, tf), _ = jax.lax.scan(iteration, (g.R, g.t), None, length=iters)

    def final_res(i, j, mR, mt):
        return jnp.linalg.norm(_edge_residual(Rf[i], tf[i], Rf[j], tf[j],
                                              mR, mt, zero6, zero6))

    res = jax.vmap(final_res)(g.edge_i, g.edge_j, g.meas_R, g.meas_t)
    return Rf, tf, jnp.mean(res)
