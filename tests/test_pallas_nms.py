"""Pallas fixpoint-NMS kernel (ops/pallas_nms.py) parity vs the XLA
`fast_nms` (itself oracle-tested in test_detect.py). Runs the kernel in
interpret mode on CPU — same program the TPU lowers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ops.detect import fast_nms
from keypoint_bench_tpu.ops.pallas_nms import fast_nms_pallas, _shift, _dir_max


def _smooth(a, sigma):
    import scipy.ndimage as ndi
    return ndi.gaussian_filter(a, sigma)


def test_shift_semantics():
    rng = np.random.default_rng(1)
    x = rng.random((6, 9)).astype(np.float32)
    for dy, dx in [(0, 1), (0, -2), (1, 0), (-3, 0), (2, 2)]:
        got = np.asarray(_shift(jnp.asarray(x), dy, dx))
        exp = np.zeros_like(x)
        for i in range(6):
            for j in range(9):
                ii, jj = i - dy, j - dx
                if 0 <= ii < 6 and 0 <= jj < 9:
                    exp[i, j] = x[ii, jj]
        np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("d", [1, 2, 4, 6])
def test_dir_max(d):
    rng = np.random.default_rng(2)
    x = rng.random((12, 16)).astype(np.float32)
    got = np.asarray(_dir_max(jnp.asarray(x), d, 0, 1))
    exp = np.zeros_like(x)
    stack = [np.asarray(_shift(jnp.asarray(x), 0, k)) for k in range(1, d + 1)]
    exp = np.max(np.stack(stack), axis=0)
    np.testing.assert_allclose(got, exp)


@pytest.mark.parametrize("h,w,d,smooth", [
    (64, 128, 4, True), (96, 128, 6, False), (128, 256, 6, True),
    (64, 128, 2, False), (60, 130, 6, True),
])
def test_fixpoint_parity(h, w, d, smooth):
    rng = np.random.default_rng(h + w + d)
    base = rng.random((h, w)).astype(np.float32)
    if smooth:
        base = _smooth(base, 3.0)
    p = jnp.asarray(base)
    a = np.asarray(fast_nms(p, d, 30))
    b = np.asarray(fast_nms_pallas(p, d, 30, interpret=True))
    np.testing.assert_allclose(a, b)


def test_vmap_parity():
    rng = np.random.default_rng(0)
    pb = jnp.asarray(_smooth(rng.random((3, 64, 128)).astype(np.float32), 2.0))
    av = jax.vmap(lambda m: fast_nms(m, 4, 30))(pb)
    bv = jax.vmap(lambda m: fast_nms_pallas(m, 4, 30, interpret=True))(pb)
    np.testing.assert_allclose(np.asarray(av), np.asarray(bv))


def test_fixpoint_parity_bf16():
    """bf16 maps run the kernel on sortable int16 keys (Mosaic rejects bf16
    float compares; int16 order == float order under the sign-flip
    transform): the result must equal the XLA fast_nms on the same bf16
    map, bit for bit."""
    rng = np.random.default_rng(7)
    base = _smooth(rng.random((96, 128)).astype(np.float32), 2.0)
    p = jnp.asarray(base, jnp.bfloat16)
    a = np.asarray(fast_nms(p, 6, 30).astype(jnp.float32))
    b = np.asarray(fast_nms_pallas(p, 6, 30, interpret=True)
                   .astype(jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_fixpoint_parity_bf16_signed():
    """Negative values exercise the sortable-int16 transform's sign branch
    (Harris responses go negative); suppression still writes 0.0."""
    rng = np.random.default_rng(8)
    base = _smooth(rng.random((64, 128)).astype(np.float32) - 0.5, 2.0)
    p = jnp.asarray(base, jnp.bfloat16)
    a = np.asarray(fast_nms(p, 4, 30).astype(jnp.float32))
    b = np.asarray(fast_nms_pallas(p, 4, 30, interpret=True)
                   .astype(jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_fused_topk_detection_batch_parity():
    """_detection_batch_fused (NMS + border + per-row peel in-kernel, row-
    chunk merge in XLA) == the unfused detection_batch path, all keys."""
    from keypoint_bench_tpu.ops.detect import (DetectParams,
                                               _detection_batch_fused,
                                               detection_batch)
    rng = np.random.default_rng(11)
    maps = jnp.asarray(_smooth(rng.random((3, 64, 128)).astype(np.float32),
                               2.0))
    dp = DetectParams(nms_dist=4, border_dist=8, top_k=100)
    k_ref, v_ref = detection_batch(maps, dp)
    k_got, v_got = _detection_batch_fused(maps, dp, interpret=True)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))


def test_fused_topk_tie_heavy_bf16():
    """bf16 sigmoid-like score maps collapse into few distinct values —
    the peel's lowest-index tie order and the unsafe-row fallback must
    keep the fused path exact."""
    from keypoint_bench_tpu.ops.detect import (DetectParams,
                                               _detection_batch_fused,
                                               detection_batch)
    rng = np.random.default_rng(12)
    base = _smooth(rng.random((2, 64, 128)).astype(np.float32), 1.0)
    maps = jnp.asarray(base, jnp.bfloat16)
    dp = DetectParams(nms_dist=2, border_dist=4, top_k=200)
    k_ref, v_ref = detection_batch(maps, dp)
    k_got, v_got = _detection_batch_fused(maps, dp, interpret=True)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
