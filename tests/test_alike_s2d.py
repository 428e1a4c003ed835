"""Space-to-depth ALIKE stem (models/alike_s2d.py): exact parity with the
reference-layout forward (same math, different summation grouping)."""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.alike_s2d import (alike_s2d, s2d, un_s2d,
                                                 transform_params_s2d)
from keypoint_bench_tpu.models.common import set_conv_precision
from keypoint_bench_tpu.weights import load_params


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 96, 5), np.float32))
    for b in (2, 4):
        y = un_s2d(s2d(x, b), b, 5)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_s2d_layout_order():
    # s2d channel order is (r, s, c): block pixel (r, s) of channel c
    x = np.zeros((1, 8, 8, 2), np.float32)
    x[0, 5, 6, 1] = 7.0     # block (1,1), r=1, s=2, c=1
    y = np.asarray(s2d(jnp.asarray(x), 4))
    assert y[0, 1, 1, (1 * 4 + 2) * 2 + 1] == 7.0
    assert y.sum() == 7.0


def test_alike_s2d_matches_alike():
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        params = load_params("Alike")
        ps2d = transform_params_s2d(params)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((2, 128, 160, 3), np.float32))
        s_ref, d_ref = get_model("Alike")(params, img)
        s_new, d_new = get_model("Alike_s2d")(ps2d, img)
        assert float(jnp.abs(s_ref - s_new).max()) < 1e-5
        assert float(jnp.abs(d_ref - d_new).max()) < 1e-5
    finally:
        set_conv_precision(None)


def test_stem_impls_identical():
    """The width-s2d conv1 (free input reshape + 12-channel conv) equals
    the stride-4 w8 conv on the raw image bit-for-bit in HIGHEST f32 —
    same taps, same summation structure."""
    from keypoint_bench_tpu.models import alike_s2d as a2
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        p = load_params("Alike_s2d")
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.random((2, 96, 128, 3), np.float32))
        outs = {}
        saved = a2._STEM_IMPL[0]
        for impl in ("ws2d", "w8"):
            a2.set_stem_impl(impl)
            outs[impl] = a2.alike_s2d_feats_cm(p, img)
        for a, b in zip(jax.tree.leaves(outs["ws2d"]),
                        jax.tree.leaves(outs["w8"])):
            assert float(jnp.abs(a - b).max()) < 1e-5
    finally:
        a2.set_stem_impl(saved)
        set_conv_precision(None)


def test_alike_s2d_via_registry_weights():
    """load_params('Alike_s2d') returns the transformed checkpoint."""
    p = load_params("Alike_s2d")
    assert "block1.conv1.weight_s2d" in p
    assert p["block1.conv1.weight_s2d"].shape == (3, 3, 48, 128)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    score, desc = get_model("Alike_s2d")(p, img)
    assert score.shape == (1, 64, 64, 1)
    assert desc.shape == (1, 64, 64, 64)


def test_blocked_input_equals_raw():
    """Pre-blocked [B, H/4, W/4, 48] input (host_s2d_images — the C++
    prefetcher's s2d emit layout) equals the raw-image forward in HIGHEST
    f32 to summation-order tolerance: conv1 on the block layout is the
    _conv_w_s2d identity (same taps, different accumulation order than
    the folded stride-4 w8 kernel)."""
    from keypoint_bench_tpu.models import alike_s2d as a2
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        p = load_params("Alike_s2d")
        rng = np.random.default_rng(5)
        img = np.asarray(rng.random((2, 96, 128, 3), np.float32))
        blk = a2.host_s2d_images(img)
        assert blk.shape == (2, 24, 32, 48)
        for fwd in (a2.alike_s2d_feats, a2.alike_s2d_feats_cm):
            ref = fwd(p, jnp.asarray(img))
            new = fwd(p, jnp.asarray(blk))
            for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(new)):
                assert float(jnp.abs(a - b).max()) < 1e-5
        # full dense model too
        s_ref, d_ref = a2.alike_s2d(p, jnp.asarray(img))
        s_new, d_new = a2.alike_s2d(p, jnp.asarray(blk))
        assert float(jnp.abs(s_ref - s_new).max()) < 1e-5
        assert float(jnp.abs(d_ref - d_new).max()) < 1e-5
    finally:
        set_conv_precision(None)
