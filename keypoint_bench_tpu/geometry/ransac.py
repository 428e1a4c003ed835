"""Vectorized fixed-hypothesis RANSAC for homography / fundamental / essential
matrices — the TPU replacement for the reference's OpenCV calls
(cv2.findHomography tasks/MHA.py:45, cv2.findFundamentalMat utils/mvg.py:16,
cv2.findEssentialMat + cv2.recoverPose tasks/AUC.py:50-63,
tasks/visual_odometer.py:75-79).

Design: instead of OpenCV's adaptive sequential RANSAC, we draw a static batch
of minimal samples (Gumbel top-k over the validity mask gives distinct valid
indices), solve every hypothesis with one batched SVD, score all hypotheses
against all correspondences with one [H_hyp, K] matrix of residuals, pick the
best by masked inlier count, and refit on the winner's inliers with a weighted
DLT. Everything is fixed-shape and jit-friendly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.geometry.smallmat import (essential_basis,
                                                  smallest_eigvec,
                                                  smallest_eigvec_exact, svd3)


def _on_tpu() -> bool:
    """Backend dispatch for the small-matrix solves (trace-time static).

    On CPU, jnp.linalg.svd is LAPACK — fast and gold-standard, and every
    parity test runs there. On TPU it is an iterative XLA algorithm whose
    convergence is data-dependent; RANSAC's near-singular DLT systems hit
    its slow path (~137 ms/pair — 4.2 s of a 6 s 32-frame VO run, round
    4), so the TPU path uses the fixed-iteration routines from
    geometry/smallmat.py instead (accuracy ~1e-4..1e-6 vs LAPACK —
    validated against the f64 gold solves; see PERF.md round 4)."""
    return jax.default_backend() == "tpu"


def _null9(M, exact: bool):
    if _on_tpu():
        return (smallest_eigvec_exact if exact else smallest_eigvec)(M)
    _, _, vt = jnp.linalg.svd(M)
    return vt[-1]


def _svd3x3(E):
    if _on_tpu():
        return svd3(E)
    return jnp.linalg.svd(E)

_HP = jax.lax.Precision.HIGHEST
_mm = functools.partial(jnp.matmul, precision=_HP)


def _sample_minimal(key, mask, n_hyp: int, sample_size: int):
    """[n_hyp, sample_size] distinct indices of valid entries (Gumbel top-k).
    If fewer than sample_size valid points exist the result repeats valid
    indices — callers must gate on the count.

    Top-k by argmax PEELING, not lax.top_k: on TPU top_k sorts every row,
    and the [n_pairs, n_hyp, K] sampling tensor of a vmapped RANSAC batch
    made that the dominant VO-pipeline cost (4.2 s of a 6 s 32-frame run,
    round 4). sample_size max+mask passes compute the same indices
    (value-descending; Gumbel ties have measure zero) ~100x cheaper."""
    k = mask.shape[0]
    g = jax.random.gumbel(key, (n_hyp, k))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_hyp, k), 1)
    idxs = []
    cur = g
    for _ in range(sample_size):
        am = jnp.argmax(cur, axis=1).astype(jnp.int32)
        idxs.append(am)
        cur = jnp.where(cols == am[:, None], -jnp.inf, cur)
    return jnp.stack(idxs, axis=1)


def _solve_dlt_h(p0: jnp.ndarray, p1: jnp.ndarray, w: jnp.ndarray,
                 exact: bool = False):
    """Weighted homography DLT. p0, p1 [N, 2]; w [N] weights.
    Returns H [3,3] (mapping p0 -> p1) via the smallest right singular vector
    of the weighted [2N, 9] design matrix. exact=True uses the
    Jacobi-accurate eigensolver (once-per-pair refits); hypotheses use the
    cheap fixed-count inverse iteration."""
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    if not exact and jax.default_backend() != "cpu":
        # TPU hypothesis path: A^T A as 45 scalar entries from the two row
        # families (M[i][j] = sum_r w^2 (r1_i r1_j + r2_i r2_j)) feeding
        # smallest_eigvec's list form — no [.., 9, 9] materialization
        # (same layout win as _solve_eightpoint, profile_r16 round 5)
        c1 = [-x, -y, -o, z, z, z, u * x, u * y, u]
        c2 = [z, z, z, -x, -y, -o, v * x, v * y, v]
        w1 = [c * w for c in c1]
        w2 = [c * w for c in c2]
        M = [[jnp.sum(w1[i] * w1[j] + w2[i] * w2[j], axis=-1)
              for j in range(i + 1)] for i in range(9)]
        return smallest_eigvec(M).reshape(3, 3)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    h = _null9(_mm(A.T, A), exact)
    return h.reshape(3, 3)


def _normalize_pts(p: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization restricted to weighted points: similarity T such
    that weighted centroid -> 0, mean distance -> sqrt(2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(p * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((p - c) ** 2, axis=1) + 1e-18)
    md = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return T


def _apply_T(T, p):
    return p * jnp.array([T[0, 0], T[1, 1]]) + jnp.array([T[0, 2], T[1, 2]])


def _homography_residual(H, p0, p1):
    """Forward reprojection error |p1 - H p0| (cv2.findHomography's measure)."""
    ph = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=1)
    q = _mm(ph, H.T)
    qz = jnp.where(jnp.abs(q[:, 2:3]) > 1e-12, q[:, 2:3], 1e-12)
    return jnp.linalg.norm(q[:, 0:2] / qz - p1, axis=1)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_homography(p0, p1, mask, key, n_hyp: int = 512, thresh: float = 3.0):
    """p0, p1 [K,2] pixel coords; mask [K]. Returns (H [3,3], inliers [K],
    ok scalar bool)."""
    idx = _sample_minimal(key, mask, n_hyp, 4)

    def solve_one(i4):
        return _solve_dlt_h(p0[i4], p1[i4], jnp.ones(4))

    Hs = jax.vmap(solve_one)(idx)                        # [n_hyp, 3, 3]
    res = jax.vmap(lambda H: _homography_residual(H, p0, p1))(Hs)
    inl = (res < thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    # refit on winning inliers with Hartley normalization
    T0 = _normalize_pts(p0, w)
    T1 = _normalize_pts(p1, w)
    Hn = _solve_dlt_h(_apply_T(T0, p0), _apply_T(T1, p1), w, exact=True)
    H = _mm(jnp.linalg.inv(T1), _mm(Hn, T0))
    H = H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)
    final_inl = (_homography_residual(H, p0, p1) < thresh) & mask
    ok = (jnp.sum(mask) >= 4) & (counts[best] >= 4)
    return H, final_inl, ok


def _solve_eightpoint(p0, p1, w, exact: bool = False):
    """Weighted 8-point DLT for F/E. p in (possibly normalized-camera) coords.
    Returns the [3,3] matrix with smallest singular residual; NOT rank-reduced.

    On TPU the hypothesis path (exact=False) builds A^T A as 45 scalar
    entries (lower triangle) and feeds smallest_eigvec's list form — no
    [.., 9, 9] materialization, whose stride-81 entry slices made the
    vmapped hypothesis eigensolve layout-bound (tools/profile_r16.py,
    round 5). Same math: M[i][j] = sum_r (w c_i)(w c_j)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    o = jnp.ones_like(x0)
    cols = [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, o]
    if not exact and jax.default_backend() != "cpu":
        wc = [c * w for c in cols]
        M = [[jnp.sum(wc[i] * wc[j], axis=-1) for j in range(i + 1)]
             for i in range(9)]
        return smallest_eigvec(M).reshape(3, 3)
    A = jnp.stack(cols, axis=1) * w[:, None]
    return _null9(_mm(A.T, A), exact).reshape(3, 3)


def _rank2(F):
    u, s, vt = _svd3x3(F)
    s = s.at[2].set(0.0)
    return _mm(u * s[None, :], vt)


def _essential_project(E):
    u, s, vt = _svd3x3(E)
    m = (s[0] + s[1]) / 2.0
    return _mm(u * jnp.array([m, m, 0.0])[None, :], vt)


def _essential_project_fast(E):
    """Essential-manifold retraction without a full SVD: null direction by
    ridge-shifted inverse iteration, pair subspace completed explicitly
    (smallmat.essential_basis's recipe), output m*(u0 v0^T + u1 v1^T) —
    EXACTLY rank-2 with equal singular values by construction, and equal
    to the exact Frobenius projection in the near-essential limit (which
    minimal-sample DLT outputs are). svd3's 36 batched Jacobi rotations
    (trig + scattered G builds) on the [n_hyp, 3, 3] hypothesis batch were
    90% of the whole VO pair-solve — 55 of 62 ms/pair at n_hyp=4096
    (tools/profile_r16.py, round 5). Sampson scoring is E-scale-invariant,
    so the residual-scale choice cannot change hypothesis ranking."""
    C = _mm(jnp.swapaxes(E, -1, -2), E)
    v2 = smallest_eigvec(C)
    a = jnp.argmin(jnp.abs(v2), axis=-1)
    axis = jax.nn.one_hot(a, 3, dtype=E.dtype)
    v0 = jnp.cross(v2, axis)
    v0 = v0 / (jnp.linalg.norm(v0, axis=-1, keepdims=True) + 1e-30)
    v1 = jnp.cross(v2, v0)
    Ev0 = jnp.einsum("...ij,...j->...i", E, v0)
    Ev1 = jnp.einsum("...ij,...j->...i", E, v1)
    s0 = jnp.linalg.norm(Ev0, axis=-1, keepdims=True)
    u0 = Ev0 / (s0 + 1e-30)
    u1 = Ev1 - jnp.sum(u0 * Ev1, axis=-1, keepdims=True) * u0
    s1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u1 = u1 / (s1 + 1e-30)
    m = 0.5 * (s0 + s1)[..., None]
    return m * (u0[..., :, None] * v0[..., None, :]
                + u1[..., :, None] * v1[..., None, :])


def _use_exact_hyp() -> bool:
    """Hypothesis projections use the exact svd3 path on CPU (bit-pinned
    parity suites; LAPACK-backed svd is fast there anyway) or when
    KBT_EXACT_HYP_PROJ=1 (the A/B knob for metric-quality studies on
    TPU)."""
    import os
    return (jax.default_backend() == "cpu"
            or os.environ.get("KBT_EXACT_HYP_PROJ", "0") == "1")


def _essential_project_hyp(E):
    """Hypothesis-batch projection: the fast retraction on TPU, the exact
    svd3 projection on CPU (the CPU parity suites are bit-pinned, and
    LAPACK-backed svd there is already fast). The once-per-pair LO refit
    always uses the exact projection — its semantics are reference-parity
    pinned (see ransac_essential's refit note)."""
    if _use_exact_hyp():
        return _essential_project(E)
    return _essential_project_fast(E)


def _rank2_hyp(F):
    """Hypothesis-batch rank-2 projection: on TPU, deflate the null
    direction — F - (F v2) v2^T with v2 from inverse iteration — which
    equals the SVD truncation exactly when v2 is the smallest right
    singular vector (inverse iteration gives it to ~eps on DLT outputs)
    and costs no Jacobi sweeps (svd3 on the hypothesis batch is the same
    90%-of-solve cost measured for the essential path, profile_r16).
    CPU keeps the exact svd3-based _rank2 (bit-pinned parity suites)."""
    if _use_exact_hyp():
        return _rank2(F)
    C = _mm(jnp.swapaxes(F, -1, -2), F)
    v2 = smallest_eigvec(C)
    Fv2 = jnp.einsum("...ij,...j->...i", F, v2)
    return F - Fv2[..., :, None] * v2[..., None, :]


def _sampson(F, p0, p1):
    """Sampson distance for x1^T F x0 = 0."""
    ph0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=1)
    ph1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    Fx0 = _mm(ph0, F.T)      # [K,3] lines in image 1
    Ftx1 = _mm(ph1, F)       # [K,3] lines in image 0
    num = jnp.sum(ph1 * Fx0, axis=1)
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return jnp.abs(num) / jnp.sqrt(jnp.maximum(den, 1e-18))


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_fundamental(p0, p1, mask, key, n_hyp: int = 512, thresh: float = 3.0):
    """8-point RANSAC for F (x1^T F x0 = 0). Returns (F, inliers, ok)."""
    idx = _sample_minimal(key, mask, n_hyp, 8)

    def solve_one(i8):
        q0, q1 = p0[i8], p1[i8]
        T0 = _normalize_pts(q0, jnp.ones(8))
        T1 = _normalize_pts(q1, jnp.ones(8))
        Fn = _rank2_hyp(_solve_eightpoint(_apply_T(T0, q0),
                                          _apply_T(T1, q1), jnp.ones(8)))
        return _mm(T1.T, _mm(Fn, T0))

    Fs = jax.vmap(solve_one)(idx)
    res = jax.vmap(lambda F: _sampson(F, p0, p1))(Fs)
    inl = (res < thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    T0 = _normalize_pts(p0, w)
    T1 = _normalize_pts(p1, w)
    Fn = _rank2(_solve_eightpoint(_apply_T(T0, p0), _apply_T(T1, p1), w,
                                  exact=True))
    F = _mm(T1.T, _mm(Fn, T0))
    final_inl = (_sampson(F, p0, p1) < thresh) & mask
    ok = (jnp.sum(mask) >= 8) & (counts[best] >= 8)
    return F, final_inl, ok


def _triangulate_depths(R, t, u0, u1):
    """For normalized rays u0 (cam0) and u1 (cam1) with X1 = R X0 + t:
    z0 (R u0 x u1) = -(t x u1)  =>  least-squares depth along each ray.
    Returns (z0, z1) [K]."""
    Ru0 = _mm(u0, R.T)
    a = jnp.cross(Ru0, u1)
    b = -jnp.cross(jnp.broadcast_to(t, u1.shape), u1)
    z0 = jnp.sum(a * b, axis=1) / jnp.maximum(jnp.sum(a * a, axis=1), 1e-18)
    x1 = z0[:, None] * Ru0 + t
    z1 = x1[:, 2]
    return z0, z1


def decompose_essential(E):
    """E -> (R1, R2, t) candidates (4 poses: (R1,±t), (R2,±t))."""
    if _on_tpu():
        # essential-specialized basis: the generic svd3 loses the third
        # columns to E^T E's squared conditioning (sigma3 ~ sqrt(eps));
        # the null-vector construction keeps R/t accurate to ~1e-7
        u, vt = essential_basis(E)
    else:
        u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = _mm(u, _mm(W, vt))
    R2 = _mm(u, _mm(W.T, vt))
    t = u[:, 2]
    return R1, R2, t


def recover_pose(E, p0, p1, mask):
    """cv2.recoverPose equivalent on normalized-camera coords: pick the
    (R, t) among the 4 decompositions with the most points in front of both
    cameras. Returns (R, t, pose_mask, count)."""
    R1, R2, t = decompose_essential(E)
    u0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=1)
    u1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)

    def count_for(R, tt):
        z0, z1 = _triangulate_depths(R, tt, u0, u1)
        good = (z0 > 0) & (z1 > 0) & mask
        return good, jnp.sum(good)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    goods, counts = zip(*[count_for(R, tt) for R, tt in cands])
    counts = jnp.stack(counts)
    goods = jnp.stack(goods)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    best = jnp.argmax(counts)
    return Rs[best], ts[best], goods[best], counts[best]


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_essential(p0n, p1n, mask, key, n_hyp: int = 512,
                     thresh: float = 1e-3):
    """8-point essential RANSAC on *normalized camera* coordinates with
    manifold projection (replaces cv2.findEssentialMat; the reference
    normalizes by intrinsics and threshold/f_mean first, tasks/AUC.py:40-49).
    Returns (E, inliers, ok)."""
    idx = _sample_minimal(key, mask, n_hyp, 8)

    def solve_one(i8):
        return _essential_project_hyp(
            _solve_eightpoint(p0n[i8], p1n[i8], jnp.ones(8)))

    Es = jax.vmap(solve_one)(idx)
    res = jax.vmap(lambda E: _sampson(E, p0n, p1n))(Es)
    inl = (res < thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # iterated inlier refit (LO-RANSAC flavour): an 8-point minimal sample
    # is much noisier than cv2's 5-point, so polish the consensus set.
    # NOTE (round 4, measured, don't "fix" without re-running the
    # reference-parity suite): both a Hartley-normalized refit and a
    # best-so-far-by-count guard were tried here; each is more robust in
    # isolation, but both SHIFTED the VO trajectories away from the
    # reference's cv2 pipeline (test_metric_parity_ext VO end-gap 0.61 m
    # vs the 0.4 m parity bound). The plain refit below reproduces the
    # reference-parity behavior.
    def refit(_, carry):
        w, _E = carry
        E = _essential_project(_solve_eightpoint(p0n, p1n, w, exact=True))
        w = ((_sampson(E, p0n, p1n) < thresh) & mask).astype(jnp.float32)
        return w, E
    w0 = inl[best].astype(jnp.float32)
    w, E = jax.lax.fori_loop(0, 3, refit, (w0, Es[best]))
    final_inl = (_sampson(E, p0n, p1n) < thresh) & mask
    ok = (jnp.sum(mask) >= 8) & (counts[best] >= 8)
    return E, final_inl, ok
