"""LightGlue parity vs golden fixture from the reference implementation in
deterministic mode (depth/width confidence disabled)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models.lightglue import (
    lightglue_forward, sample_descriptors_lg, normalize_keypoints_masked)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "lightglue.npz")


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(GOLDEN):
        pytest.skip("no lightglue golden")
    return np.load(GOLDEN)


def test_lightglue_matches_reference(fixture):
    g = fixture
    params = {k[len("param:"):]: jnp.asarray(g[k])
              for k in g.files if k.startswith("param:")}
    m = g["kpts0"].shape[1]
    n = g["kpts1"].shape[1]
    m0, mscores0, ok = lightglue_forward(
        params,
        jnp.asarray(g["kpts0"][0]), jnp.ones(m, bool),
        jnp.asarray(g["desc0"][0]),
        jnp.asarray(g["kpts1"][0]), jnp.ones(n, bool),
        jnp.asarray(g["desc1"][0]))
    m0 = np.asarray(m0)
    ref_m0 = g["matches0"][0]
    agree = (m0 == ref_m0).mean()
    assert agree >= 0.97, (agree, m0[:20], ref_m0[:20])
    np.testing.assert_allclose(np.asarray(mscores0), g["mscores0"][0],
                               atol=2e-3)


def test_lightglue_padding_invariance(fixture):
    """Padding with masked junk rows must not change valid matches."""
    g = fixture
    params = {k[len("param:"):]: jnp.asarray(g[k])
              for k in g.files if k.startswith("param:")}
    m = g["kpts0"].shape[1]
    n = g["kpts1"].shape[1]
    m0a, _, oka = lightglue_forward(
        params, jnp.asarray(g["kpts0"][0]), jnp.ones(m, bool),
        jnp.asarray(g["desc0"][0]), jnp.asarray(g["kpts1"][0]),
        jnp.ones(n, bool), jnp.asarray(g["desc1"][0]))

    pad = 16
    rng = np.random.default_rng(0)
    k0p = np.concatenate([g["kpts0"][0], rng.uniform(0, 511, (pad, 2))]) \
        .astype(np.float32)
    d0p = np.concatenate([g["desc0"][0], rng.normal(0, 1, (pad, 256))]) \
        .astype(np.float32)
    v0p = np.r_[np.ones(m, bool), np.zeros(pad, bool)]
    m0b, _, okb = lightglue_forward(
        params, jnp.asarray(k0p), jnp.asarray(v0p), jnp.asarray(d0p),
        jnp.asarray(g["kpts1"][0]), jnp.ones(n, bool),
        jnp.asarray(g["desc1"][0]))
    assert (np.asarray(m0b)[:m] == np.asarray(m0a)).mean() > 0.97
    assert not np.asarray(okb)[m:].any()


def test_sample_descriptors_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    dmap = rng.normal(0, 1, (8, 10, 16)).astype(np.float32)  # h,w,C
    kpts = rng.uniform(0, 64, (20, 2)).astype(np.float32)
    s = 8
    ours = np.asarray(sample_descriptors_lg(jnp.asarray(kpts),
                                            jnp.asarray(dmap), s))
    # torch reference formula (lightglue.py:24-41)
    t = torch.from_numpy(dmap.transpose(2, 0, 1))[None]
    kp = torch.from_numpy(kpts)[None] - s / 2 + 0.5
    kp = kp / torch.tensor([10 * s - s / 2 - 0.5, 8 * s - s / 2 - 0.5])
    kp = kp * 2 - 1
    d = F.grid_sample(t, kp.view(1, 1, -1, 2), mode="bilinear",
                      align_corners=True)
    d = F.normalize(d.reshape(1, 16, -1), p=2, dim=1)[0].T.numpy()
    np.testing.assert_allclose(ours, d, atol=1e-5)


def test_normalize_keypoints_masked():
    rng = np.random.default_rng(2)
    kpts = rng.uniform(0, 500, (30, 2)).astype(np.float32)
    valid = np.ones(30, bool)
    out = np.asarray(normalize_keypoints_masked(jnp.asarray(kpts),
                                                jnp.asarray(valid)))
    size = 1 + kpts.max(0) - kpts.min(0)
    ref = (kpts - size / 2) / (size.max() / 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)
