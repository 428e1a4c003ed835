"""Brute-force matcher parity: grid sampling vs torch grid_sample, mutual-NN
vs a numpy oracle with skimage match_descriptors semantics."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from keypoint_bench_tpu.ops.grid_sample import grid_sample_align_corners
from keypoint_bench_tpu.ops.matching import mutual_nn_match, brute_force_match


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 8)).astype(np.float32)   # H, W, C
    pts = rng.random((100, 2)).astype(np.float32)      # (x, y) in [0,1]

    ours = np.asarray(grid_sample_align_corners(jnp.asarray(img), jnp.asarray(pts)))

    timg = torch.from_numpy(img.transpose(2, 0, 1))[None]  # 1,C,H,W
    grid = torch.from_numpy((pts - 0.5) * 2)[None, None]   # 1,1,N,2
    tref = F.grid_sample(timg, grid, align_corners=True).squeeze(2)[0].T.numpy()
    np.testing.assert_allclose(ours, tref, atol=1e-5)


def match_oracle(d0, d1, max_distance):
    """skimage.feature.match_descriptors(euclidean, cross_check=True) semantics."""
    dist = np.linalg.norm(d0[:, None] - d1[None], axis=2)
    nn01 = dist.argmin(1)
    nn10 = dist.argmin(0)
    pairs = []
    for i in range(len(d0)):
        j = nn01[i]
        if nn10[j] == i and dist[i, j] < max_distance:
            pairs.append((i, j))
    return set(pairs)


def test_mutual_nn_matches_oracle():
    rng = np.random.default_rng(1)
    d0 = rng.random((60, 16)).astype(np.float32)
    d1 = np.concatenate([d0[:40] + 0.01 * rng.random((40, 16)).astype(np.float32),
                         rng.random((30, 16)).astype(np.float32)])
    ref = match_oracle(d0, d1, max_distance=5.0)
    nn01, ok = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1),
                               jnp.ones(60, bool), jnp.ones(70, bool), 5.0)
    ours = {(i, int(nn01[i])) for i in range(60) if ok[i]}
    assert ours == ref
    assert len(ref) >= 35  # the perturbed copies should mostly match


def test_mutual_nn_respects_masks():
    rng = np.random.default_rng(2)
    d0 = rng.random((10, 4)).astype(np.float32)
    d1 = d0.copy()
    v0 = np.ones(10, bool); v0[5:] = False
    v1 = np.ones(10, bool); v1[0] = False
    nn01, ok = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1),
                               jnp.asarray(v0), jnp.asarray(v1), np.inf)
    ok = np.asarray(ok)
    assert not ok[5:].any()          # invalid queries can't match
    assert not (np.asarray(nn01)[ok] == 0).any()  # invalid targets can't match
    # identical valid descriptors (1..4) must match to themselves
    assert ok[1:5].all() and (np.asarray(nn01)[1:5] == np.arange(1, 5)).all()


def test_brute_force_match_end_to_end():
    rng = np.random.default_rng(3)
    dmap0 = rng.random((32, 32, 8)).astype(np.float32)
    dmap1 = dmap0.copy()
    k = 20
    kpts = np.concatenate([rng.uniform(0.2, 0.8, (k, 2)),
                           rng.random((k, 1))], axis=1).astype(np.float32)
    valid = np.ones(k, bool)
    p0, p1, ok = brute_force_match(jnp.asarray(kpts), jnp.asarray(valid),
                                   jnp.asarray(kpts), jnp.asarray(valid),
                                   jnp.asarray(dmap0), jnp.asarray(dmap1), 5.0)
    ok = np.asarray(ok)
    assert ok.all()
    np.testing.assert_allclose(np.asarray(p1)[:, :2], kpts[:, :2], atol=1e-6)


def test_bf16_match_agrees_with_f32():
    """bf16-descriptor matching (bench fast path) must agree with the f32
    parity path except on sub-bf16 margins: perturbed-copy pairs have real
    margins and must match identically."""
    rng = np.random.default_rng(4)
    d0 = rng.normal(size=(200, 64)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    noise = 0.03 * rng.normal(size=(150, 64)).astype(np.float32)
    d1 = np.concatenate([d0[:150] + noise,
                         rng.normal(size=(80, 64)).astype(np.float32)])
    v0 = np.ones(200, bool)
    v1 = np.ones(230, bool)
    nn_f, ok_f = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1),
                                 jnp.asarray(v0), jnp.asarray(v1), 5.0)
    nn_b, ok_b = mutual_nn_match(jnp.asarray(d0, jnp.bfloat16),
                                 jnp.asarray(d1, jnp.bfloat16),
                                 jnp.asarray(v0), jnp.asarray(v1), 5.0)
    ok_f, ok_b = np.asarray(ok_f), np.asarray(ok_b)
    nn_f, nn_b = np.asarray(nn_f), np.asarray(nn_b)
    # all true-copy pairs survive in both modes with identical assignment
    assert ok_f[:150].all() and ok_b[:150].all()
    assert (nn_f[:150] == nn_b[:150]).all()
    # overall agreement: bf16 may flip only marginal distractor matches
    agree = (ok_f == ok_b) & (~ok_f | (nn_f == nn_b))
    assert agree.mean() > 0.97
