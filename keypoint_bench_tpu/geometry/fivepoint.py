"""Five-point minimal essential-matrix solver (Stewenius et al., "Recent
developments on direct relative orientation"), TPU-native.

Replaces cv2.findEssentialMat's 5-point kernel (reference tasks/AUC.py:50 and
tasks/visual_odometer.py:75 call OpenCV; SURVEY.md §2.6). The 8-point +
LO-refit pipeline in geometry/ransac.py stays the default; the 5-point solver
is exact on minimal samples, which matters in small-match-count regimes.

Design notes (why this shape on TPU):
  * The E-nullspace comes from `eigh` of A^T A (9x9 symmetric) — TPU-supported,
    unlike nonsymmetric `eig`.
  * The 10x20 polynomial template is built by *static* exponent bookkeeping at
    trace time (dict-of-monomials polynomial arithmetic over jnp scalars), so
    there are no hand-transcribed coefficient tables to get wrong.
  * Columns ordered [10 degree-3 monomials | 10 monomials of degree <= 2]:
    Gauss-Jordan (one linear solve) rewrites every degree-3 monomial over the
    degree-<=2 basis, giving the 10x10 action matrix T for multiplication by
    z in the quotient ring. Its eigenvalues are the z-roots.
  * XLA has no nonsymmetric eigensolver on TPU, so real eigenvalues are found
    by sign-change bracketing of det(T - z I) on a bounded grid (Gershgorin
    bound) + bisection — batched 10x10 slogdet, fori_loop, fixed shapes.
    Complex roots never produce real essential matrices, and even-multiplicity
    real roots are a measure-zero event inside RANSAC sampling.
  * x, y for each root come from the nullspace of (T - z I) via SVD.
"""
from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp


# Monomial basis in (x, y, z): 10 degree-3 monomials first (eliminated), then
# the 10 degree-<=2 quotient-basis monomials.
_DEG3 = [(3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
         (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3)]
_BASIS = [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
          (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_MON20 = _DEG3 + _BASIS
_MON_IDX = {m: i for i, m in enumerate(_MON20)}
_BASIS_IDX = {m: i for i, m in enumerate(_BASIS)}


def _pmul(a: dict, b: dict) -> dict:
    out: dict = {}
    for ea, ca in a.items():
        for eb, cb in b.items():
            e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            out[e] = out.get(e, 0.0) + ca * cb
    return out


def _padd(*ps) -> dict:
    out: dict = {}
    for p in ps:
        for e, c in p.items():
            out[e] = out.get(e, 0.0) + c
    return out


def _pscale(p: dict, s) -> dict:
    return {e: c * s for e, c in p.items()}


def _null4(p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """5 correspondences (normalized camera coords, [5,2] each) -> the 4-dim
    nullspace of the epipolar constraint matrix, as [4, 3, 3] E-basis."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    o = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, o],
                  axis=1)                                    # [5, 9]
    _, vecs = jnp.linalg.eigh(A.T @ A)                        # ascending
    return vecs[:, :4].T.reshape(4, 3, 3)


def _template(Eb: jnp.ndarray) -> jnp.ndarray:
    """E-basis [4,3,3] -> the 10x20 constraint template M over _MON20.

    Rows: det(E) = 0 and the 9 entries of 2 (E E^T) E - trace(E E^T) E = 0.
    """
    # E entries as degree-1 polynomials
    E = [[{(1, 0, 0): Eb[0, i, j], (0, 1, 0): Eb[1, i, j],
           (0, 0, 1): Eb[2, i, j], (0, 0, 0): Eb[3, i, j]}
          for j in range(3)] for i in range(3)]

    def det3(m):
        t0 = _pmul(m[0][0], _padd(_pmul(m[1][1], m[2][2]),
                                  _pscale(_pmul(m[1][2], m[2][1]), -1.0)))
        t1 = _pmul(m[0][1], _padd(_pmul(m[1][2], m[2][0]),
                                  _pscale(_pmul(m[1][0], m[2][2]), -1.0)))
        t2 = _pmul(m[0][2], _padd(_pmul(m[1][0], m[2][1]),
                                  _pscale(_pmul(m[1][1], m[2][0]), -1.0)))
        return _padd(t0, t1, t2)

    EEt = [[_padd(*[_pmul(E[i][k], E[j][k]) for k in range(3)])
            for j in range(3)] for i in range(3)]
    tr = _padd(EEt[0][0], EEt[1][1], EEt[2][2])
    polys = [det3(E)]
    for i in range(3):
        for j in range(3):
            cij = _padd(*[_pscale(_pmul(EEt[i][k], E[k][j]), 2.0)
                          for k in range(3)],
                        _pscale(_pmul(tr, E[i][j]), -1.0))
            polys.append(cij)

    rows = []
    for p in polys:
        row = [jnp.zeros(())] * 20
        for e, c in p.items():
            row[_MON_IDX[e]] = row[_MON_IDX[e]] + c
        rows.append(jnp.stack(row))
    return jnp.stack(rows)                                    # [10, 20]


def _action_matrix(M: jnp.ndarray) -> jnp.ndarray:
    """Gauss-Jordan the template and build the multiplication-by-z action
    matrix T [10,10] on the quotient basis _BASIS."""
    # every degree-3 monomial m_d3[i] == -B[i] . basis
    B = jnp.linalg.solve(M[:, :10], M[:, 10:])                # [10, 10]
    rows = []
    for m in _BASIS:
        zm = (m[0], m[1], m[2] + 1)
        if zm in _BASIS_IDX:
            rows.append(jnp.zeros(10).at[_BASIS_IDX[zm]].set(1.0))
        else:
            rows.append(-B[_DEG3.index(zm)])
    return jnp.stack(rows)                                     # [10, 10]


def _balance(T: jnp.ndarray, n_sweep: int = 12) -> jnp.ndarray:
    """Diagonal similarity scaling D T D^-1 equalizing row/column norms
    (LAPACK gebal-style, vectorized-approximate). Eigenvalues are unchanged;
    the Gershgorin bound drops from O(||T||) to ~the spectral radius, which
    the root-finding grid needs (unbalanced action matrices overshoot the
    eigenvalue range by orders of magnitude)."""
    def sweep(_, M):
        a = jnp.abs(M)
        r = jnp.sum(a, axis=1) - jnp.diag(a)
        c = jnp.sum(a, axis=0) - jnp.diag(a)
        f = jnp.sqrt(jnp.maximum(c, 1e-30) / jnp.maximum(r, 1e-30))
        f = jnp.clip(f, 0.25, 4.0)  # damped per-sweep update
        return M * f[:, None] / f[None, :]
    return jax.lax.fori_loop(0, n_sweep, sweep, T)


def _real_eigs_by_bisection(T: jnp.ndarray, n_grid: int = 256,
                            n_bisect: int = 40):
    """Real eigenvalues of a 10x10 matrix via sign changes of det(T - z I).

    Returns (roots [10], valid [10]) — at most 10 real roots, masked.
    """
    n = T.shape[0]
    T = _balance(T)
    # Gershgorin bound on |eigenvalues| of the balanced matrix
    bound = jnp.max(jnp.sum(jnp.abs(T), axis=1)) + 1e-3

    # sinh-spaced grid: dense near 0 (where the meaningful roots cluster —
    # one large outlier eigenvalue would otherwise stretch a uniform grid so
    # several O(1) roots share a cell and pairs cancel), coarse at the tails
    scale = 0.05
    u_max = jnp.arcsinh(bound / scale)
    zs = jnp.sinh(jnp.linspace(-1.0, 1.0, n_grid) * u_max) * scale  # [G]

    def detsign(z):
        s, logd = jnp.linalg.slogdet(T - z * jnp.eye(n))
        return s

    signs = jax.vmap(detsign)(zs)                              # [G]
    flips = (signs[:-1] * signs[1:]) < 0                       # [G-1]
    # indices of up to 10 sign changes (priority by position; masked)
    pri = jnp.where(flips, -jnp.arange(n_grid - 1, dtype=jnp.float32),
                    -jnp.inf)
    _, take = jax.lax.top_k(pri, n)                            # first 10 flips
    valid = flips[take]
    lo = zs[take]
    hi = zs[take + 1]

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        smid = jax.vmap(detsign)(mid)
        slo = jax.vmap(detsign)(lo)
        go_left = smid * slo < 0
        return jnp.where(go_left, lo, mid), jnp.where(go_left, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
    return 0.5 * (lo + hi), valid


def five_point_candidates(p0: jnp.ndarray, p1: jnp.ndarray):
    """5 normalized-camera correspondences -> up to 10 essential matrices.

    Returns (Es [10, 3, 3] Frobenius-normalized, valid [10] bool).
    """
    Eb = _null4(p0, p1)
    M = _template(Eb)
    T = _action_matrix(M)
    finite = jnp.all(jnp.isfinite(T))
    T = jnp.where(finite, T, jnp.eye(10))
    zs, valid = _real_eigs_by_bisection(T)
    valid = valid & finite

    def xy_for(z):
        # nullspace of (T - z I): right singular vector of smallest sv
        _, s, vt = jnp.linalg.svd(T - z * jnp.eye(10))
        v = vt[-1]
        # x and y are ratios of eigenvector entries; pick the denominator
        # with the most signal: (x/1, y/1) via v[x],v[y],v[1] or
        # (xz/z, yz/z) via v[xz],v[yz],v[z]
        d1 = v[_BASIS_IDX[(0, 0, 0)]]
        dz = v[_BASIS_IDX[(0, 0, 1)]]
        use_z = jnp.abs(dz) > jnp.abs(d1)
        denom = jnp.where(use_z, dz, d1)
        num_x = jnp.where(use_z, v[_BASIS_IDX[(1, 0, 1)]],
                          v[_BASIS_IDX[(1, 0, 0)]])
        num_y = jnp.where(use_z, v[_BASIS_IDX[(0, 1, 1)]],
                          v[_BASIS_IDX[(0, 1, 0)]])
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        return num_x / safe, num_y / safe, jnp.abs(denom) > 1e-12

    xs, ys, ok = jax.vmap(xy_for)(zs)
    Es = (xs[:, None, None] * Eb[0] + ys[:, None, None] * Eb[1]
          + zs[:, None, None] * Eb[2] + Eb[3])
    norm = jnp.linalg.norm(Es.reshape(10, 9), axis=1)
    Es = Es / jnp.maximum(norm, 1e-12)[:, None, None]
    return Es, valid & ok & (norm > 1e-12)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_essential_5pt(p0n, p1n, mask, key, n_hyp: int = 256,
                         thresh: float = 1e-3):
    """5-point essential RANSAC on normalized camera coordinates.

    Same contract as geometry.ransac.ransac_essential: (E, inliers, ok).
    Each minimal sample yields up to 10 candidates, all scored; the best
    consensus set is polished with the iterated projected refit.
    """
    from keypoint_bench_tpu.geometry.ransac import (
        _essential_project, _sample_minimal, _sampson, _solve_eightpoint)

    idx = _sample_minimal(key, mask, n_hyp, 5)

    def cands(i5):
        return five_point_candidates(p0n[i5], p1n[i5])

    Es, valid = jax.vmap(cands)(idx)                  # [H,10,3,3], [H,10]
    Es = Es.reshape(-1, 3, 3)
    valid = valid.reshape(-1)
    res = jax.vmap(lambda E: _sampson(E, p0n, p1n))(Es)
    inl = (res < thresh) & mask[None, :] & valid[:, None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    def refit(_, carry):
        w, _E = carry
        E = _essential_project(_solve_eightpoint(p0n, p1n, w))
        w = ((_sampson(E, p0n, p1n) < thresh) & mask).astype(jnp.float32)
        return w, E

    w0 = inl[best].astype(jnp.float32)
    w, E = jax.lax.fori_loop(0, 3, refit, (w0, Es[best]))
    final_inl = (_sampson(E, p0n, p1n) < thresh) & mask
    ok = (jnp.sum(mask) >= 5) & (counts[best] >= 5)
    return E, final_inl, ok
