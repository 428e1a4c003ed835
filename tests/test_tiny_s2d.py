"""Fast layouts for the tiny full-res detectors (models/tiny_s2d.py):
exact parity with the reference-layout forwards on real weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.common import set_conv_precision
from keypoint_bench_tpu.weights import load_params


@pytest.mark.parametrize("name", ["LETNet", "GoodPoint"])
def test_tiny_s2d_parity(name):
    set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        params = load_params(name)
        ps2d = load_params(f"{name}_s2d")
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((2, 128, 160, 3), np.float32))
        s_ref, d_ref = get_model(name)(params, img)
        s_new, d_new = get_model(f"{name}_s2d")(ps2d, img)
        assert s_ref.shape == s_new.shape
        assert d_ref.shape == d_new.shape
        assert float(jnp.abs(s_ref - s_new).max()) < 1e-5
        assert float(jnp.abs(d_ref - d_new).max()) < 1e-5
    finally:
        set_conv_precision(None)
