"""Fused Pallas sparse sampler == XLA sampling paths.

ops/pallas_sample.py evaluates all four ALIKE branch samples in one kernel
on channel-major features; results must match the gather/mm samplers (and
hence dense-map sampling, tests/test_sparse_desc.py) to float tolerance.
Runs in Pallas interpret mode on the CPU test mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models.alike_s2d import (alike_s2d, alike_s2d_feats,
                                                 alike_s2d_feats_cm,
                                                 transform_params_s2d)
from keypoint_bench_tpu.models.common import set_conv_precision
from keypoint_bench_tpu.ops.detect import DetectParams, detection
from keypoint_bench_tpu.ops.grid_sample import sample_at_points
from keypoint_bench_tpu.ops.pallas_sample import fused_samples, supported
from keypoint_bench_tpu.ops.sparse_desc import (alike_sparse_descriptors,
                                                alike_sparse_descriptors_cm,
                                                sample_direct,
                                                sample_upsampled)


def test_fused_samples_direct_exact_f32():
    """Kernel's in-register direct bilinear taps vs the gather sampler on
    one full-res branch with odd (non-tile) shapes."""
    rng = np.random.default_rng(1)
    h, w, ch = 96, 160, 5
    feat = jnp.asarray(rng.random((h, w, ch), np.float32))
    k, kp = 50, 128
    px = jnp.asarray(rng.uniform(0, w - 1.001, k), jnp.float32)
    py = jnp.asarray(rng.uniform(0, h - 1.001, k), jnp.float32)
    ref = sample_direct(feat, px, py)                         # gather, f32

    pxp = jnp.pad(px, (0, kp - k))
    pyp = jnp.pad(py, (0, kp - k))
    ft = jnp.transpose(feat, (2, 0, 1))                       # [C, h, w]
    out = fused_samples((ft,), pxp, pyp, h, w, (), interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :k]).T, np.asarray(ref),
                               atol=1e-5)


def test_fused_samples_multi_branch_exact_f32():
    """Four branches in one kernel (in-kernel direct + composite upsample
    taps) == per-branch XLA sampling."""
    rng = np.random.default_rng(2)
    h, w = 128, 160
    shapes = [(128, 160), (64, 80), (16, 20), (4, 5)]
    feats = [jnp.asarray(rng.random((hl, wl, 16), np.float32))
             for hl, wl in shapes]
    k, kp = 100, 128
    px = jnp.asarray(rng.uniform(0, w - 1.001, k), jnp.float32)
    py = jnp.asarray(rng.uniform(0, h - 1.001, k), jnp.float32)
    refs = [sample_direct(feats[0], px, py)] + [
        sample_upsampled(f, px, py, h, w) for f in feats[1:]]

    pxp, pyp = jnp.pad(px, (0, kp - k)), jnp.pad(py, (0, kp - k))
    fts = tuple(jnp.transpose(f, (2, 0, 1)) for f in feats)
    assert supported(fts)
    out = np.asarray(fused_samples(fts, pxp, pyp, h, w,
                                   tuple(shapes[1:]), interpret=True))
    for i, ref in enumerate(refs):
        np.testing.assert_allclose(out[16 * i:16 * (i + 1), :k].T,
                                   np.asarray(ref), atol=1e-5,
                                   err_msg=f"branch {i}")


def test_feats_cm_matches_feats():
    """Channel-major forward: same score map, transposed branch features."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.random((1, 128, 160, 3), np.float32))
        score, feats = alike_s2d_feats(params, img)
        score_cm, feats_cm = alike_s2d_feats_cm(params, img)
        np.testing.assert_allclose(np.asarray(score_cm), np.asarray(score),
                                   atol=1e-5)
        for i, (f, ft) in enumerate(zip(feats, feats_cm)):
            np.testing.assert_allclose(np.asarray(ft),
                                       np.asarray(f).transpose(0, 3, 1, 2),
                                       atol=1e-6, err_msg=f"branch {i}")
    finally:
        set_conv_precision(None)


def test_cm_descriptors_match_dense_end_to_end():
    """Full cm pipeline (feats_cm forward + fused kernel) == dense-map
    sampling at detected keypoints — the bench path's parity anchor."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.random((1, 128, 160, 3), np.float32))
        h, w = img.shape[1], img.shape[2]
        dp = DetectParams(nms_dist=4, border_dist=8, top_k=200)

        score_d, desc_d = alike_s2d(params, img)
        kpts, _ = detection(score_d[0], dp)
        ref = sample_at_points(desc_d[0], kpts)

        _, feats_cm = alike_s2d_feats_cm(params, img)
        got = alike_sparse_descriptors_cm(params, [f[0] for f in feats_cm],
                                          kpts, h, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
    finally:
        set_conv_precision(None)


def test_cm_batch_matches_per_map():
    """Batched kernel grid (maps x k-tiles) == per-map calls."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        from keypoint_bench_tpu.ops.sparse_desc import (
            alike_sparse_descriptors_cm_batch)
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.random((3, 128, 160, 3), np.float32))
        h, w = 128, 160
        dp = DetectParams(nms_dist=4, border_dist=8, top_k=200)
        score, feats_cm = alike_s2d_feats_cm(params, imgs)
        kpts = jnp.stack([detection(score[i], dp)[0] for i in range(3)])
        got = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        for i in range(3):
            want = alike_sparse_descriptors_cm(
                params, [f[i] for f in feats_cm], kpts[i], h, w,
                interpret=True)
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                       atol=1e-5, err_msg=f"map {i}")
    finally:
        set_conv_precision(None)


def test_feats_cm_dilated_matches_permute():
    """The lhs-dilated-conv branch path (depth-to-space as a one-hot-tap
    conv with the 1x1 head folded in) == the permute path, f32-exact."""
    from keypoint_bench_tpu.models import alike_s2d as a2
    set_conv_precision(jax.lax.Precision.HIGHEST)
    old_impl = a2._CM_BRANCH_IMPL[0]
    try:
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.random((2, 128, 160, 3), np.float32))
        a2.set_cm_branch_impl("permute")
        score_p, feats_p = alike_s2d_feats_cm(params, img)
        a2.set_cm_branch_impl("dilated")
        score_d, feats_d = alike_s2d_feats_cm(params, img)
        np.testing.assert_allclose(np.asarray(score_d), np.asarray(score_p),
                                   atol=1e-5)
        for i, (a, b) in enumerate(zip(feats_p, feats_d)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, err_msg=f"branch {i}")
    finally:
        a2.set_cm_branch_impl(old_impl)
        set_conv_precision(None)


def test_cm_fallback_on_tiny_maps():
    """64^2 images make a4 2x2 — below the kernel's 4-row floor — so the cm
    API must fall back to the XLA path and still match dense sampling."""
    params = transform_params_s2d(__import__(
        "keypoint_bench_tpu.weights", fromlist=["load_params"]
    ).load_params("Alike"))
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    dp = DetectParams(nms_dist=4, border_dist=4, top_k=64)
    score_d, desc_d = alike_s2d(params, img)
    kpts, _ = detection(score_d[0], dp)
    ref = sample_at_points(desc_d[0], kpts)
    _, feats_cm = alike_s2d_feats_cm(params, img)
    assert not supported([f[0] for f in feats_cm])
    got = alike_sparse_descriptors_cm(params, [f[0] for f in feats_cm],
                                      kpts, 64, 64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_cm_sorted_matches_full_kernel():
    """Band-restricted sorted-tile kernel (+ sort/unsort plumbing) == full
    kernel == dense sampling, original keypoint order."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        from keypoint_bench_tpu.ops.sparse_desc import (
            alike_sparse_descriptors_cm_batch, set_cm_sorted)
        from keypoint_bench_tpu.ops import pallas_sample
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(13)
        # tall enough for sorted_supported (h >= ROWS0) on the CPU mesh:
        # shrink ROWS0 for the test instead of paying a 128-row forward
        old_rows0 = pallas_sample.ROWS0
        pallas_sample.ROWS0 = 32
        imgs = jnp.asarray(rng.random((2, 128, 160, 3), np.float32))
        h, w = 128, 160
        dp = DetectParams(nms_dist=4, border_dist=8, top_k=200)
        score, feats_cm = alike_s2d_feats_cm(params, imgs)
        kpts = jnp.stack([detection(score[i], dp)[0] for i in range(2)])
        set_cm_sorted(False)
        want = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        set_cm_sorted(True)
        got = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
    finally:
        pallas_sample.ROWS0 = old_rows0
        set_cm_sorted(True)
        set_conv_precision(None)


def test_cm_sorted_overflow_falls_back():
    """Keypoints clustered into one band overflow a sorted tile's span —
    the batch-level cond must take the full kernel and stay exact."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        from keypoint_bench_tpu.ops.sparse_desc import (
            alike_sparse_descriptors_cm_batch, set_cm_sorted)
        from keypoint_bench_tpu.ops import pallas_sample
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(14)
        old_rows0 = pallas_sample.ROWS0
        pallas_sample.ROWS0 = 32
        imgs = jnp.asarray(rng.random((1, 128, 160, 3), np.float32))
        h, w = 128, 160
        _, feats_cm = alike_s2d_feats_cm(params, imgs)
        # 200 keypoints spread over the FULL height: tiles of 128 sorted
        # keypoints span ~64 rows > ROWS0-2=30 -> overflow -> fallback
        k = 200
        kx = rng.uniform(0.1, 0.9, k).astype(np.float32)
        ky = np.linspace(0.05, 0.95, k).astype(np.float32)
        kpts = jnp.asarray(np.stack([kx, ky, np.ones(k, np.float32)],
                                    axis=-1))[None]
        set_cm_sorted(False)
        want = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        set_cm_sorted(True)
        got = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
    finally:
        pallas_sample.ROWS0 = old_rows0
        set_cm_sorted(True)
        set_conv_precision(None)


def test_yorder_equivalent_to_original_order():
    """The y-ordered sampler API returns the same (kpt, desc, valid) rows
    as the original-order API, consistently permuted — verified by exact
    lexicographic row-set equality and by identical mutual-NN match sets."""
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        from keypoint_bench_tpu.ops.sparse_desc import (
            alike_sparse_descriptors_cm_batch,
            alike_sparse_descriptors_cm_batch_yorder)
        from keypoint_bench_tpu.ops import pallas_sample
        params = transform_params_s2d(__import__(
            "keypoint_bench_tpu.weights", fromlist=["load_params"]
        ).load_params("Alike"))
        rng = np.random.default_rng(15)
        old_rows0 = pallas_sample.ROWS0
        pallas_sample.ROWS0 = 32
        imgs = jnp.asarray(rng.random((2, 128, 160, 3), np.float32))
        h, w = 128, 160
        dp = DetectParams(nms_dist=4, border_dist=8, top_k=150)
        score, feats_cm = alike_s2d_feats_cm(params, imgs)
        det = [detection(score[i], dp) for i in range(2)]
        kpts = jnp.stack([d[0] for d in det])
        valid = jnp.stack([d[1] for d in det])

        d_ref = alike_sparse_descriptors_cm_batch(
            params, tuple(feats_cm), kpts, h, w, interpret=True)
        d_y, k_y, v_y = alike_sparse_descriptors_cm_batch_yorder(
            params, tuple(feats_cm), kpts, valid, h, w, interpret=True)

        for i in range(2):
            a = np.concatenate([np.asarray(kpts[i]),
                                np.asarray(valid[i], np.float32)[:, None],
                                np.asarray(d_ref[i])], axis=1)
            b = np.concatenate([np.asarray(k_y[i]),
                                np.asarray(v_y[i], np.float32)[:, None],
                                np.asarray(d_y[i])], axis=1)
            a = a[np.lexsort(a.T[::-1])]
            b = b[np.lexsort(b.T[::-1])]
            np.testing.assert_allclose(b, a, atol=1e-5, err_msg=f"map {i}")
    finally:
        pallas_sample.ROWS0 = old_rows0
        set_conv_precision(None)
