"""Pallas LK kernel == the XLA level iteration (ops/lk._lk_level), in
interpret mode on CPU — same program the TPU lowers. Covers interior
points, border points (zero-pad ring gradient masking), and fractional
template coordinates."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ops.lk import _lk_level
from keypoint_bench_tpu.ops.pallas_lk import lk_level_pallas, supported


def _textured(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.random((h // 4, w // 4, 1)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4, 1), np.float32))
    return np.repeat(img, 3, axis=2)


@pytest.mark.parametrize("win", [11, 21])
def test_pallas_lk_level_equals_xla(win):
    h, w = 64, 80
    b = 2
    imgs1 = np.stack([_textured(h, w, s) for s in range(b)])
    # img2: slightly shifted copies so the solve has real structure
    imgs2 = np.stack([np.roll(im, (1, -2), axis=(0, 1)) for im in imgs1])
    rng = np.random.default_rng(3)
    n = 40
    pts1 = rng.uniform(12, min(h, w) - 12, (b, n, 2)).astype(np.float32)
    pts2 = pts1 + rng.uniform(-2, 2, (b, n, 2)).astype(np.float32)

    assert supported((h, w, 3), win)
    got = lk_level_pallas(jnp.asarray(imgs1), jnp.asarray(imgs2),
                          jnp.asarray(pts1), jnp.asarray(pts2),
                          win, 8, interpret=True)
    ref = jax.vmap(
        lambda i1, i2, p1, p2: _lk_level(i1, i2, p1, p2, win, 8))(
        jnp.asarray(imgs1), jnp.asarray(imgs2),
        jnp.asarray(pts1), jnp.asarray(pts2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-4)


def test_pallas_lk_border_points():
    """Points whose windows cross the image border: the in-window conv's
    zero-pad ring masking must reproduce the sampled global gradient."""
    h, w = 64, 80
    win = 11
    img1 = _textured(h, w, 7)[None]
    img2 = np.roll(img1, (0, 2, -1, 0), axis=(0, 1, 2, 3))
    pts1 = np.array([[[3.2, 4.1], [w - 4.0, 2.5], [2.2, h - 3.5],
                      [w - 3.3, h - 2.9], [40.0, 3.0]]], np.float32)
    got = lk_level_pallas(jnp.asarray(img1), jnp.asarray(img2),
                          jnp.asarray(pts1), jnp.asarray(pts1),
                          win, 6, interpret=True)
    ref = _lk_level(jnp.asarray(img1[0]), jnp.asarray(img2[0]),
                    jnp.asarray(pts1[0]), jnp.asarray(pts1[0]), win, 6)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               atol=5e-3, rtol=1e-4)


def test_supported_gate():
    assert not supported((64, 80, 1), 11)     # needs 3 channels
    assert not supported((64, 80, 3), 12)     # even win
    assert not supported((4096, 4096, 3), 21)  # VMEM budget
