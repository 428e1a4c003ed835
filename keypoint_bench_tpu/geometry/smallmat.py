"""Fixed-iteration small-matrix factorizations for RANSAC-scale batches.

Why: XLA's jnp.linalg.svd on TPU is an iterative algorithm with
DATA-DEPENDENT while-loops. On random well-conditioned matrices it looks
fast (131072 9x9 SVDs in 0.1 ms), but RANSAC feeds it NEAR-SINGULAR
design matrices by construction (the null vector IS the answer), which
hit the slow convergence path: the essential-RANSAC solve measured
~137 ms/pair — 4.2 s of a 6 s 32-frame VO run (round 4, /tmp/vo_diag4).
These replacements are branch-free with static iteration counts, so the
cost is data-independent and every op is a plain VPU vector op over the
hypothesis batch.

  * smallest_eigvec: ridge-shifted inverse iteration with an UNROLLED
    Cholesky solve (d is static and tiny) — converges at ratio
    (lam_min/lam_2)^iters, essentially exact in 4 iterations for DLT
    systems where lam_min << lam_2; for degenerate hypotheses the result
    is an arbitrary vector of the near-null subspace, exactly like SVD's
    tie behavior, and RANSAC's consensus vote discards it either way.
  * eigh3 / svd3: fixed-sweep cyclic Jacobi on 3x3 symmetric matrices,
    descending eigenvalues; svd3 completes U with a cross product when
    the smallest singular value underflows (rank-2 fundamental/essential
    projection — the main 3x3 consumer).

All functions batch over arbitrary leading dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_unrolled(M):
    """Cholesky of PSD input with static tiny d — fully unrolled (no
    while-loops; ~d^3/6 vector ops over the batch). `M` is either a
    [..., d, d] tensor or a lower-triangular list-of-lists of [...]
    entries (M[i][j], j <= i) — the list form never materializes the
    [..., d, d] tensor, so the per-entry reads are plain batched vectors
    instead of stride-d^2 slices (the tensor form's slices made the
    batched 9x9 eigensolve layout-bound on TPU: 3.0 of 6.7 ms/pair in the
    VO RANSAC, tools/profile_r16.py round 5)."""
    if isinstance(M, (list, tuple)):
        d = len(M)
        get = lambda i, j: M[i][j]
    else:
        d = M.shape[-1]
        get = lambda i, j: M[..., i, j]
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = get(i, j)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L, b):
    """Solve L L^T x = b for b [..., d] given the unrolled factor."""
    d = len(L)
    y = [None] * d
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def smallest_eigvec(M, iters: int = 6):
    """Unit eigenvector of the smallest eigenvalue of PSD M (the DLT null
    vector of A^T A). Ridge-shifted inverse iteration with a deterministic
    start; sign is arbitrary (DLT outputs are scale/sign-invariant).

    `M` is a [..., d, d] tensor, or a lower-triangular list-of-lists of
    batched [...] entries (see _chol_unrolled) — the list form avoids the
    [..., d, d] materialization and its stride-d^2 entry slices."""
    if isinstance(M, (list, tuple)):
        return _smallest_eigvec_entries(M, iters)
    d = M.shape[-1]
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    # the ridge must sit ABOVE f32 roundoff of the factorization
    # (~eps*||M||): at 1e-9*tr the Cholesky pivot in the null direction
    # goes negative, hits the sqrt clamp, and the solve overflows to a
    # zero/NaN vector (measured on exact essential matrices). But a large
    # ridge flattens the gap to the SECOND-smallest eigenvalue and mixes
    # the result (~ridge/lam_2) — enough to collapse RANSAC inlier counts
    # at tight thresholds. Two stages: converge at the safe 1e-6*tr, then
    # sharpen at 1e-7*tr with a finite-guard fallback to the stage-1
    # vector (the shift never changes the eigenvectors, only stability).
    eye = jnp.eye(d, dtype=M.dtype)
    v = jnp.ones(M.shape[:-1], M.dtype)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    for ridge_rel in (1e-6, 1e-7):
        ridge = ridge_rel * tr / d + 1e-30
        L = _chol_unrolled(M + ridge * eye)
        v_prev = v
        for _ in range(iters // 2):
            v = _chol_solve_unrolled(L, v)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)
        ok = jnp.all(jnp.isfinite(v), axis=-1, keepdims=True) \
            & (jnp.linalg.norm(v, axis=-1, keepdims=True) > 0.5)
        v = jnp.where(ok, v, v_prev)
    return v


def _smallest_eigvec_entries(M, iters: int = 6):
    """smallest_eigvec for the lower-triangular list-of-lists form: the
    same two-stage ridge-shifted inverse iteration (see the tensor path's
    ridge note) with every matrix entry a plain batched vector."""
    d = len(M)
    tr = M[0][0]
    for i in range(1, d):
        tr = tr + M[i][i]
    bshape = jnp.shape(tr)
    dtype = jnp.result_type(M[0][0])
    v = jnp.full(bshape + (d,), 1.0 / (d ** 0.5), dtype)
    for ridge_rel in (1e-6, 1e-7):
        ridge = ridge_rel * tr / d + 1e-30
        Mr = [[M[i][j] + ridge if i == j else M[i][j]
               for j in range(i + 1)] for i in range(d)]
        L = _chol_unrolled(Mr)
        v_prev = v
        for _ in range(iters // 2):
            v = _chol_solve_unrolled(L, v)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)
        ok = jnp.all(jnp.isfinite(v), axis=-1, keepdims=True) \
            & (jnp.linalg.norm(v, axis=-1, keepdims=True) > 0.5)
        v = jnp.where(ok, v, v_prev)
    return v


def _jacobi_rot(C, V, p: int, q: int):
    """One cyclic-Jacobi rotation zeroing C[p, q] (batched, branch-free)."""
    app = C[..., p, p]
    aqq = C[..., q, q]
    apq = C[..., p, q]
    theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    d = C.shape[-1]
    G = jnp.zeros(C.shape[:-2] + (d, d), C.dtype)
    G = G + jnp.eye(d, dtype=C.dtype)
    G = G.at[..., p, p].set(c).at[..., q, q].set(c)
    G = G.at[..., p, q].set(s).at[..., q, p].set(-s)
    C = jnp.swapaxes(G, -1, -2) @ C @ G
    V = V @ G
    return C, V


def eighn(C, sweeps: int = 10):
    """Symmetric [..., d, d] eigendecomposition by fixed-sweep cyclic
    Jacobi (d static and tiny). Returns (w [..., d] DESCENDING,
    V [..., d, d] columns matching w). LAPACK-class accuracy with a fixed
    op count — use for the accuracy-critical once-per-pair refits."""
    d = C.shape[-1]
    V = jnp.zeros_like(C) + jnp.eye(d, dtype=C.dtype)
    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                C, V = _jacobi_rot(C, V, p, q)
    w = jnp.diagonal(C, axis1=-2, axis2=-1)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def eigh3(C, sweeps: int = 12):
    return eighn(C, sweeps)


def smallest_eigvec_exact(M, sweeps: int = 10):
    """Jacobi-accurate smallest eigenvector (vs the fast ridge-shifted
    inverse iteration, whose ridge flattens the gap between the two
    smallest eigenvalues of noisy DLT systems)."""
    _, V = eighn(M, sweeps)
    return V[..., :, -1]


def essential_basis(E):
    """Orthonormal (U, Vt) with E ~ U diag(s, s, 0) Vt for a
    (near-)essential E — i.e. two equal singular values and a zero one.
    svd3's generic route loses the third columns to the squared
    conditioning of E^T E (sigma_3 accuracy ~ sqrt(eps)); here the null
    directions come from inverse iteration (accurate to ~eps) and the
    well-conditioned pair subspace is completed explicitly:
    v2 = null(E^T E); v0 ⊥ v2 via a stable axis pick; u_i = E v_i
    normalized (|E v_i| = sigma, O(1)); u2 = u0 x u1."""
    C = jnp.swapaxes(E, -1, -2) @ E
    v2 = smallest_eigvec(C)
    # axis least aligned with v2 (batched one-hot of argmin |v2|)
    a = jnp.argmin(jnp.abs(v2), axis=-1)
    axis = jax.nn.one_hot(a, 3, dtype=E.dtype)
    v0 = jnp.cross(v2, axis)
    v0 = v0 / (jnp.linalg.norm(v0, axis=-1, keepdims=True) + 1e-30)
    v1 = jnp.cross(v2, v0)
    u0 = jnp.einsum("...ij,...j->...i", E, v0)
    u0 = u0 / (jnp.linalg.norm(u0, axis=-1, keepdims=True) + 1e-30)
    u1 = jnp.einsum("...ij,...j->...i", E, v1)
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + 1e-30)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=-1)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return U, jnp.swapaxes(V, -1, -2)


def svd3(E):
    """SVD of [..., 3, 3]: returns (U, s, Vt) with s descending,
    E = U diag(s) Vt. Built from eigh3(E^T E); the third left vector
    falls back to the right-handed cross product when s[2] underflows
    (rank-2 inputs — fundamental/essential projection)."""
    C = jnp.swapaxes(E, -1, -2) @ E
    w, V = eigh3(C)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    EV = E @ V                                       # columns E v_i
    tol = 1e-12 + 1e-6 * s[..., 0:1]
    u0 = EV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-30)
    u0 = u0 / (jnp.linalg.norm(u0, axis=-1, keepdims=True) + 1e-30)
    u1 = EV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-30)
    # orthogonalize u1 against u0 (fp safety), normalize
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + 1e-30)
    u2_direct = EV[..., :, 2] / jnp.maximum(s[..., 2:3], 1e-30)
    u2_cross = jnp.cross(u0, u1)
    use_direct = (s[..., 2:3] > tol)
    u2 = jnp.where(use_direct, u2_direct, u2_cross)
    u2 = u2 - jnp.sum(u0 * u2, axis=-1, keepdims=True) * u0
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / (jnp.linalg.norm(u2, axis=-1, keepdims=True) + 1e-30)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
