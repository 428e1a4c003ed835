"""Pallas fixpoint-NMS kernel (ops/pallas_nms.py) parity vs the XLA
`fast_nms` (itself oracle-tested in test_detect.py). Runs the kernel in
interpret mode on CPU — same program the TPU lowers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ops.detect import fast_nms
from keypoint_bench_tpu.ops.pallas_nms import fast_nms_pallas, _window_sum, _shift


def _smooth(a, sigma):
    import scipy.ndimage as ndi
    return ndi.gaussian_filter(a, sigma)


@pytest.mark.parametrize("d", [1, 2, 4, 6])
@pytest.mark.parametrize("axis", [0, 1])
def test_window_sum(d, axis):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 3, (12, 16)).astype(np.float32)
    got = np.asarray(_window_sum(jnp.asarray(x), d, axis))
    exp = np.zeros_like(x)
    for o in range(-d, d + 1):
        exp += np.asarray(_shift(jnp.asarray(x),
                                 o if axis == 0 else 0,
                                 o if axis == 1 else 0))
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
