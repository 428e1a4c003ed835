"""Model weight-import parity: our JAX implementations vs golden activations
captured from the reference torch models (tests/golden/make_golden.py)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
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
    pkeys = [k for k in g.files if k.startswith("param:")]
    if pkeys:  # randomized-weight fixture (blob unavailable)
        params = {k[len("param:"):]: jnp.asarray(g[k]) for k in pkeys}
    else:
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


def test_superpoint_parity():
    _check("SuperPoint", atol=5e-4)


def test_xfeat_parity():
    _check("XFeat", atol=5e-4)


def test_disk_parity():
    _check("DISK", atol=5e-4)


def test_sfd2_parity():
    _check("sfd2", atol=1e-3, rtol=1e-3)


def test_d2net_parity():
    _check("D2Net", atol=1e-3, rtol=1e-3)


def test_harris_matches_cv2():
    import cv2
    rng = np.random.default_rng(7)
    img = rng.random((1, 64, 80, 3)).astype(np.float32)
    model = get_model("Harris")
    params = {"block_size": 5, "ksize": 3, "k": 0.04}
    score, desc = model(params, jnp.asarray(img))
    assert desc is None
    gray = (np.sum(img[0], axis=2) * 255).astype("uint8")
    ref = cv2.cornerHarris(gray, 5, 3, 0.04)
    np.testing.assert_allclose(np.asarray(score)[0, ..., 0], ref,
                               atol=1e-6, rtol=1e-3)
