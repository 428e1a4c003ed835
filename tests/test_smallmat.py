"""Fixed-iteration small-matrix routines (geometry/smallmat.py) vs LAPACK.

These are the TPU-side replacements for jnp.linalg.svd inside RANSAC
(geometry/ransac.py dispatches by backend: CPU keeps LAPACK, TPU uses
these). The CPU test pipeline therefore never exercises them implicitly —
this file validates them against numpy's LAPACK directly."""
import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.geometry.smallmat import (eighn, essential_basis,
                                                  smallest_eigvec,
                                                  smallest_eigvec_exact,
                                                  svd3)


def _rand_essential(rng):
    a = rng.standard_normal(3)
    a /= np.linalg.norm(a)
    ax = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    th = rng.uniform(0, 2)
    R = (np.eye(3) * np.cos(th) + np.sin(th) * ax
         + (1 - np.cos(th)) * np.outer(a, a))
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return (tx @ R).astype(np.float32)


@pytest.mark.parametrize("solver,align_tol", [(smallest_eigvec, 5e-3),
                                              (smallest_eigvec_exact, 1e-4)])
def test_smallest_eigvec_matches_lapack_null(solver, align_tol):
    rng = np.random.default_rng(0)
    for trial in range(8):
        A = rng.standard_normal((20, 9)).astype(np.float32)
        v0 = rng.standard_normal(9).astype(np.float32)
        v0 /= np.linalg.norm(v0)
        A = A - A @ np.outer(v0, v0)          # exact null vector v0
        M = (A.T @ A).astype(np.float32)
        v = np.asarray(solver(jnp.asarray(M)))
        assert abs(float(v @ v0)) > 1 - align_tol, trial


def test_smallest_eigvec_batched():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((64, 12, 9)).astype(np.float32)
    M = np.einsum("bij,bik->bjk", A, A)
    v = np.asarray(smallest_eigvec(jnp.asarray(M)))
    gold = np.stack([np.linalg.svd(M[i])[2][-1] for i in range(64)])
    align = np.abs(np.sum(v * gold, axis=1))
    # noisy full-rank systems: the ridge bounds accuracy, but the vector
    # must stay in the right subspace for RANSAC hypothesis quality
    assert np.median(align) > 0.999
    assert (align > 0.99).mean() > 0.8


def test_eighn_residual():
    rng = np.random.default_rng(2)
    for d in (3, 9):
        A = rng.standard_normal((16, d, d)).astype(np.float32)
        M = np.einsum("bij,bik->bjk", A, A)
        w, V = eighn(jnp.asarray(M))
        w, V = np.asarray(w), np.asarray(V)
        res = np.abs(np.einsum("bij,bjk->bik", M, V)
                     - V * w[:, None, :]).max()
        assert res < 1e-3 * np.abs(M).max()
        assert (np.diff(w, axis=1) <= 1e-5).all()     # descending


def test_svd3_reconstruction():
    rng = np.random.default_rng(3)
    E = rng.standard_normal((16, 3, 3)).astype(np.float32)
    U, s, Vt = svd3(jnp.asarray(E))
    U, s, Vt = np.asarray(U), np.asarray(s), np.asarray(Vt)
    rec = np.einsum("bij,bj,bjk->bik", U, s, Vt)
    assert np.abs(rec - E).max() < 1e-5
    for M in (U, np.swapaxes(Vt, 1, 2)):
        orth = np.einsum("bij,bik->bjk", M, M)
        assert np.abs(orth - np.eye(3)).max() < 1e-5


def test_essential_basis_exact_on_essentials():
    rng = np.random.default_rng(4)
    for _ in range(8):
        E = _rand_essential(rng)
        U, Vt = essential_basis(jnp.asarray(E))
        U, Vt = np.asarray(U), np.asarray(Vt)
        rec = U @ np.diag([1.0, 1.0, 0.0]) @ Vt
        assert np.abs(rec - E).max() < 1e-5
        assert np.abs(U.T @ U - np.eye(3)).max() < 1e-5
        # u2 spans the left null space (the translation direction)
        assert np.abs(E.T @ U[:, 2]).max() < 1e-5
