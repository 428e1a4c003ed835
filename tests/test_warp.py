"""Homography / SE3 warp parity with the reference conventions."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.geometry.warp import warp_homography, warp_se3
from keypoint_bench_tpu.tasks.repeatability import repeatability_pair


def test_warp_homography_identity():
    k = 50
    rng = np.random.default_rng(0)
    kpts = rng.uniform(0.1, 0.9, (k, 3)).astype(np.float32)
    valid = np.ones(k, bool)
    p0, p01, v = warp_homography(jnp.asarray(kpts), jnp.asarray(valid),
                                 jnp.eye(3), 640, 480)
    assert np.asarray(v).all()
    np.testing.assert_allclose(np.asarray(p01), kpts[:, :2], atol=1e-6)


def test_warp_homography_translation_bounds():
    # shift +100px in x in a 640-wide image: points past x=(539)/639 fall out
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 100.0
    kpts = np.array([[0.5, 0.5, 1.0], [0.95, 0.5, 1.0]], np.float32)
    p0, p01, v = warp_homography(jnp.asarray(kpts), jnp.ones(2, dtype=bool),
                                 jnp.asarray(H), 640, 480)
    v = np.asarray(v)
    assert v[0] and not v[1]
    np.testing.assert_allclose(np.asarray(p01)[0, 0],
                               (0.5 * 639 + 100) / 639, atol=1e-5)


def test_warp_se3_identity_pose():
    h, w = 64, 80
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
    kpts = np.array([[0.5, 0.5, 1.0], [0.3, 0.4, 1.0], [0.05, 0.5, 1.0]], np.float32)
    p0, p01, v = warp_se3(jnp.asarray(kpts), jnp.ones(3, dtype=bool),
                          jnp.eye(4), jnp.zeros(2), jnp.zeros(2),
                          jnp.asarray(depth), jnp.asarray(depth),
                          jnp.asarray(K), jnp.asarray(K))
    v = np.asarray(v)
    assert v[0] and v[1]
    assert not v[2]  # x=0.05*80=4 < 10-px interpolation border
    np.testing.assert_allclose(np.asarray(p01)[v], kpts[v, :2], atol=1e-5)


def test_warp_se3_translation():
    # camera translated +0.2m in x, constant depth 2m, fronto-parallel plane:
    # pixel shift = fx * tx / z = 100*(-0.2)/2 = -10 px (pose01 maps cam0->cam1)
    h, w = 64, 80
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -0.2
    kpts = np.array([[0.5, 0.5, 1.0]], np.float32)
    p0, p01, v = warp_se3(jnp.asarray(kpts), jnp.ones(1, dtype=bool),
                          jnp.asarray(T), jnp.zeros(2), jnp.zeros(2),
                          jnp.asarray(depth), jnp.asarray(depth),
                          jnp.asarray(K), jnp.asarray(K))
    assert np.asarray(v)[0]
    np.testing.assert_allclose(np.asarray(p01)[0, 0], (0.5 * 80 - 10) / 80,
                               atol=1e-5)


def test_repeatability_identity_pair():
    # identical keypoints under identity warp -> every mutual pair except the
    # reference's masked diagonal; the diagonal hack pairs i with i, so the
    # nearest non-diagonal entries win and rep reflects the off-by-diagonal
    # matching of identical sets.
    k = 16
    rng = np.random.default_rng(4)
    pts = rng.uniform(0.2, 0.8, (k, 2)).astype(np.float32)
    kpts = np.concatenate([pts, rng.random((k, 1)).astype(np.float32)], axis=1)
    valid = jnp.ones(k, dtype=bool)
    p0, p01, v = warp_homography(jnp.asarray(kpts), valid, jnp.eye(3), 512, 512)
    out = repeatability_pair(jnp.asarray(kpts), valid, jnp.asarray(kpts), valid,
                             p0, p01, v, p0, p01, v, scale=512.0, th=3.0)
    assert int(out["num_feat"]) == k
    # identical sets: dist_mutual is 0 on the true diagonal, which the
    # reference masks out -- matches must use neighbours >0 px away, so rep
    # counts only pairs whose nearest *other* point is within 3 px: ~0 here.
    assert float(out["repeatability"]) <= 1.0


def test_repeatability_shifted_pair():
    # set B = set A with indices rolled by one: true matches are off-diagonal,
    # so the diagonal mask doesn't interfere and rep = 1.
    k = 16
    rng = np.random.default_rng(5)
    pts = rng.uniform(0.2, 0.8, (k, 2)).astype(np.float32)
    kptsA = np.concatenate([pts, rng.random((k, 1)).astype(np.float32)], axis=1)
    kptsB = np.roll(kptsA, 1, axis=0)
    valid = jnp.ones(k, dtype=bool)
    a0, a01, va = warp_homography(jnp.asarray(kptsA), valid, jnp.eye(3), 512, 512)
    b0, b01, vb = warp_homography(jnp.asarray(kptsB), valid, jnp.eye(3), 512, 512)
    out = repeatability_pair(jnp.asarray(kptsA), valid, jnp.asarray(kptsB), valid,
                             a0, a01, va, b0, b01, vb, scale=512.0, th=3.0)
    assert float(out["repeatability"]) == 1.0
    assert float(out["mean_error"]) < 1e-3
