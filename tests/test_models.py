"""Model weight-import parity: our JAX implementations vs golden activations
captured from the reference torch models (tests/golden/make_golden.py)."""
import os

import numpy as np
import jax
import pytest

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models import common
from keypoint_bench_tpu.weights import load_params

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _check(name, atol=2e-4, rtol=0.0):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no golden fixture for {name}")
    g = np.load(path)
    img = g["image"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    params = load_params(name)
    model = get_model(name)
    common.set_conv_precision(jax.lax.Precision.HIGHEST)
    try:
        score, desc = model(params, img)
    finally:
        common.set_conv_precision(None)
    score = np.asarray(score)
    np.testing.assert_allclose(score[..., 0], g["score"][:, 0], atol=atol,
                               rtol=rtol,
                               err_msg=f"{name} score map mismatch")
    if "desc" in g.files and desc is not None:
        np.testing.assert_allclose(
            np.asarray(desc), g["desc"].transpose(0, 2, 3, 1), atol=atol,
            err_msg=f"{name} desc map mismatch")


def test_alike_parity():
    _check("Alike")


def test_letnet_parity():
    _check("LETNet")


def test_goodpoint_parity():
    _check("GoodPoint")


def test_edgepoint_parity():
    _check("EdgePoint")


def test_keynet_parity():
    _check("KeyNet", atol=1e-2, rtol=1e-4)  # raw scores reach ~7e3; f32 scale


def test_r2d2_parity():
    _check("r2d2", atol=5e-4)
