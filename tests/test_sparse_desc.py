"""Sparse (keypoint-only) descriptors == dense-map sampling, exactly.

The sparse path (ops/sparse_desc.py) replaces the dense full-res descriptor
map (the pipeline's dominant HBM cost) with per-keypoint composite sampling
of the raw branch features; sampling, align-corners upsampling and the 1x1
head are all linear, so the results must agree to float tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models.alike_s2d import (alike_s2d, alike_s2d_feats,
                                                 transform_params_s2d)
from keypoint_bench_tpu.models.common import (resize_bilinear_align,
                                              set_conv_precision)
from keypoint_bench_tpu.ops.detect import DetectParams, detection
from keypoint_bench_tpu.ops.grid_sample import (sample_at_points,
                                                sample_bilinear_pixels)
from keypoint_bench_tpu.ops.sparse_desc import (alike_sparse_descriptors,
                                                sample_direct,
                                                sample_upsampled,
                                                set_sample_impl)
from keypoint_bench_tpu.weights import load_params


def test_sample_upsampled_matches_dense_resize():
    """Composite-tap sampling == materialize upsample, then bilinear sample
    (random maps, random subpixel points, incl. edge-hugging ones)."""
    rng = np.random.default_rng(0)
    for h_lo, w_lo, f in [(8, 8, 4), (16, 12, 8), (64, 64, 2), (4, 4, 32)]:
        h_hi, w_hi = h_lo * f, w_lo * f
        feat = jnp.asarray(rng.random((h_lo, w_lo, 5), np.float32))
        k = 64
        px = jnp.asarray(
            np.concatenate([rng.uniform(0, w_hi - 1 - 1e-3, k - 4),
                            [0.0, w_hi - 1.001, 0.3, w_hi - 1.3]]),
            jnp.float32)
        py = jnp.asarray(
            np.concatenate([rng.uniform(0, h_hi - 1 - 1e-3, k - 4),
                            [0.0, h_hi - 1.001, h_hi - 1.2, 0.7]]),
            jnp.float32)
        dense = resize_bilinear_align(feat[None], h_hi, w_hi)[0]
        ref = sample_bilinear_pixels(dense, px, py)
        got = sample_upsampled(feat, px, py, h_hi, w_hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=f"{h_lo}x{w_lo}x{f}")


def test_sample_direct_matches_bilinear():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.random((32, 48, 7), np.float32))
    px = jnp.asarray(rng.uniform(0.01, 46.99, 33), jnp.float32)
    py = jnp.asarray(rng.uniform(0.01, 30.99, 33), jnp.float32)
    ref = sample_bilinear_pixels(feat, px, py)
    got = sample_direct(feat, px, py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_mm_impl_matches_gather_exactly_f32():
    """The one-hot-matmul sampling path is exact in f32 (same weights, same
    taps, different contraction order)."""
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.random((16, 12, 5), np.float32))
    h_hi, w_hi = 128, 96
    px = jnp.asarray(rng.uniform(0, w_hi - 1.001, 40), jnp.float32)
    py = jnp.asarray(rng.uniform(0, h_hi - 1.001, 40), jnp.float32)
    try:
        set_sample_impl("gather")
        ref = sample_upsampled(feat, px, py, h_hi, w_hi)
        set_sample_impl("mm")
        got = sample_upsampled(feat, px, py, h_hi, w_hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
        f2 = jnp.asarray(rng.random((32, 32, 3), np.float32))
        px2 = jnp.asarray(rng.uniform(0, 30.99, 40), jnp.float32)
        py2 = jnp.asarray(rng.uniform(0, 30.99, 40), jnp.float32)
        ref2 = sample_bilinear_pixels(f2, px2, py2)
        got2 = sample_direct(f2, px2, py2)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=1e-5)
    finally:
        set_sample_impl("auto")


def test_mm_impl_bf16_close():
    """bf16 mm sampling (bench fast path) only rounds the interpolation
    weights to bf16 — results stay within ~2^-7 of the exact values."""
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.random((16, 16, 8), np.float32))
    px = jnp.asarray(rng.uniform(0, 126.9, 50), jnp.float32)
    py = jnp.asarray(rng.uniform(0, 126.9, 50), jnp.float32)
    exact = sample_upsampled(feat, px, py, 128, 128)
    got = sample_upsampled(feat.astype(jnp.bfloat16), px, py, 128, 128)
    assert np.abs(np.asarray(got) - np.asarray(exact)).max() < 2e-2


def test_alike_sparse_descriptors_match_dense():
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        params = transform_params_s2d(load_params("Alike"))
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.random((1, 128, 160, 3), np.float32))
        h, w = img.shape[1], img.shape[2]
        dp = DetectParams(nms_dist=4, border_dist=8, top_k=200)

        score_d, desc_d = alike_s2d(params, img)
        score_s, feats = alike_s2d_feats(params, img)
        np.testing.assert_allclose(np.asarray(score_s), np.asarray(score_d),
                                   atol=1e-5)

        kpts, valid = detection(score_d[0], dp)
        ref = sample_at_points(desc_d[0], kpts)
        got = alike_sparse_descriptors(params, [f[0] for f in feats],
                                       kpts, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
    finally:
        set_conv_precision(None)


def test_sample_direct_blk_matches_full_res():
    """Block-layout (space-to-depth) direct sampling == full-res sampling:
    exact in f32 mm mode, bf16-rounded otherwise (the bench path feeds it
    the stem's a1b without the un_s2d relayout)."""
    from keypoint_bench_tpu.models.alike_s2d import s2d
    from keypoint_bench_tpu.ops.sparse_desc import (sample_direct,
                                                    sample_direct_blk)
    rng = np.random.default_rng(5)
    feat = jnp.asarray(rng.random((64, 96, 16), np.float32))
    fb = s2d(feat[None], 4)[0]
    px = jnp.asarray(rng.uniform(0, 95.9, 80), jnp.float32)
    py = jnp.asarray(rng.uniform(0, 63.9, 80), jnp.float32)
    set_sample_impl("mm")
    try:
        want = sample_direct(feat, px, py)
        got = sample_direct_blk(fb, px, py, 4, 16)
    finally:
        set_sample_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # bf16 (the auto mm path): only input rounding
    got16 = sample_direct_blk(fb.astype(jnp.bfloat16), px, py, 4, 16)
    assert np.abs(np.asarray(got16) - np.asarray(want)).max() < 2e-2
    # f32 auto (gather fallback through the local un_s2d): exact
    got_g = sample_direct_blk(fb, px, py, 4, 16)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want),
                               atol=1e-5)
