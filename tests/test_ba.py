"""Bundle adjustment: convergence on synthetic problems."""
import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ba import BAProblem, ba_solve, reprojection_errors


def make_problem(C=6, P=60, noise_px=0.0, pose_noise=0.0, pt_noise=0.0,
                 seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    pts = np.concatenate([rng.uniform(-2, 2, (P, 2)),
                          rng.uniform(6, 12, (P, 1))], axis=1)
    import cv2
    Rs, ts = [], []
    for c in range(C):
        aa = rng.normal(0, 0.05, 3)
        R, _ = cv2.Rodrigues(aa)
        t = np.array([0.3 * c, 0.05 * c, 0.0]) + rng.normal(0, 0.05, 3)
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)

    cam_idx, pt_idx, uvs = [], [], []
    for c in range(C):
        for p in range(P):
            Xc = Rs[c] @ pts[p] + ts[c]
            if Xc[2] < 1:
                continue
            uv = (K @ (Xc / Xc[2]))[:2]
            cam_idx.append(c)
            pt_idx.append(p)
            uvs.append(uv + rng.normal(0, noise_px, 2))
    prob = BAProblem(
        R=jnp.asarray(Rs, jnp.float32),
        t=jnp.asarray(ts, jnp.float32),
        points=jnp.asarray(pts, jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(np.stack(uvs), jnp.float32),
        mask=jnp.ones(len(uvs), bool),
        K=jnp.asarray(K))
    truth = (Rs.copy(), ts.copy(), pts.copy())

    # perturb initialization
    if pose_noise > 0:
        pRs, pts_ = [], []
        for c in range(C):
            aa = rng.normal(0, pose_noise, 3)
            dR, _ = cv2.Rodrigues(aa)
            pRs.append(dR @ Rs[c])
        Rs = np.stack(pRs)
        ts = ts + rng.normal(0, pose_noise * 5, ts.shape)
        # keep cam0 at truth (gauge)
        Rs[0] = truth[0][0]
        ts[0] = truth[1][0]
    if pt_noise > 0:
        pts = pts + rng.normal(0, pt_noise, pts.shape)
    prob = BAProblem(jnp.asarray(Rs, jnp.float32), jnp.asarray(ts, jnp.float32),
                     jnp.asarray(pts, jnp.float32), prob.cam_idx, prob.pt_idx,
                     prob.uv, prob.mask, prob.K)
    return prob, truth


def test_ba_perfect_data_stays_converged():
    prob, _ = make_problem()
    R, t, p, err = ba_solve(prob, iters=3)
    assert float(err) < 1e-2


def test_ba_converges_from_noisy_init():
    prob, truth = make_problem(pose_noise=0.02, pt_noise=0.05, seed=1)
    err0 = float(jnp.sum(reprojection_errors(prob))
                 / jnp.sum(prob.mask))
    R, t, p, err = ba_solve(prob, iters=12)
    assert err0 > 3.0          # the perturbation was real
    assert float(err) < 0.05, (err0, float(err))


def test_ba_with_pixel_noise():
    prob, truth = make_problem(noise_px=0.5, pose_noise=0.01, pt_noise=0.02,
                               seed=2)
    R, t, p, err = ba_solve(prob, iters=12)
    # converges to the noise floor (~0.5px residuals)
    assert 0.1 < float(err) < 1.2, float(err)
