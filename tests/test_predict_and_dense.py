"""predict_positions parity vs the reference torch math; warp_dense; LK vs
cv2 cross-check."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.ops.predict import predict_positions
from keypoint_bench_tpu.geometry.warp import warp_dense


def torch_predict_positions(desc0, desc1):
    """Reference utils/extracter.py:103-126 math in numpy/torch for oracle."""
    import torch
    import torch.nn.functional as F
    d0 = torch.from_numpy(desc0.transpose(2, 0, 1))[None]
    d1 = torch.from_numpy(desc1.transpose(2, 0, 1))[None]
    b, d, h, w = d0.shape
    x = torch.linspace(1 / w / 2, 1 - 1 / w / 2, w)
    y = torch.linspace(1 / h / 2, 1 - 1 / h / 2, h)
    hw_grid = torch.stack(torch.meshgrid([x, y], indexing="ij")) \
        .view(2, -1).t()[:, [1, 0]]
    f0 = d0.view(1, d, -1)
    f1 = d1.view(1, d, -1)
    score = torch.einsum("bdn,bdm->bnm", f0, f1)
    score = torch.cat([score, torch.ones(1, h * w, 1) * 0.01], dim=2)
    max_v = score.max(dim=2).values
    x_exp = torch.exp((score - max_v[:, :, None]) / 0.01)[0, :, :-1]
    xy = x_exp @ hw_grid / x_exp.sum(dim=1)[:, None]
    sample = xy * 2.0 - 1
    scores = F.grid_sample(x_exp.view(b, h * w, h, w),
                           sample.unsqueeze(0).unsqueeze(0), mode="bilinear",
                           align_corners=True, padding_mode="zeros")
    scores = torch.diag(scores.view(h * w, h * w))
    return torch.cat([xy, scores[:, None]], dim=1).numpy()


def test_predict_positions_parity():
    rng = np.random.default_rng(0)
    d0 = rng.random((8, 8, 16)).astype(np.float32)
    d1 = (d0 + 0.3 * rng.random((8, 8, 16))).astype(np.float32)
    d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = d1 / np.linalg.norm(d1, axis=-1, keepdims=True)
    ours = np.asarray(predict_positions(jnp.asarray(d0), jnp.asarray(d1)))
    ref = torch_predict_positions(d0, d1)
    np.testing.assert_allclose(ours[:, :2], ref[:, :2], atol=1e-4)
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], atol=1e-3)


def test_warp_dense_identity():
    h, w = 16, 20
    p0, p01, v = warp_dense(h, w, {"mode": "homo",
                                   "homography_matrix": jnp.eye(3),
                                   "width": w, "height": h})
    assert p0.shape == (h * w, 2)
    assert bool(np.asarray(v).all())
    np.testing.assert_allclose(np.asarray(p01), np.asarray(p0), atol=1e-6)


def test_native_lk_matches_cv2():
    """Cross-check our LK against cv2.calcOpticalFlowPyrLK on a translated
    texture — both should recover the same flow."""
    import jax
    from keypoint_bench_tpu.ops.lk import optical_flow, optical_flow_cv, \
        LKParams
    from scipy.signal import convolve2d
    rng = np.random.default_rng(3)
    base = np.kron(rng.random((40, 50)), np.ones((4, 4)))
    base = convolve2d(base, np.ones((3, 3)) / 9, mode="same", boundary="symm")
    img0 = np.repeat(base[..., None], 3, axis=2).astype(np.float32)
    img1 = np.roll(img0, (2, -3), axis=(0, 1))
    pts = rng.uniform(0.3, 0.7, (30, 2)).astype(np.float32)

    ours, _ = optical_flow(jnp.asarray(img0), jnp.asarray(img1),
                           jnp.asarray(pts), jnp.asarray(pts),
                           jax.random.key(0),
                           LKParams(distance=2, win_size=15, levels=2,
                                    iterations=30))
    cv_pts, status = optical_flow_cv(img0, img1, pts, pts)
    ours = np.asarray(ours)
    good = status > 0
    d = np.linalg.norm((ours - cv_pts) * np.array([199, 159]), axis=1)
    assert np.median(d[good]) < 1.0, np.median(d[good])
