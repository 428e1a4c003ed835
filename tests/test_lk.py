"""LK optical flow: recover a known translation on a textured synthetic image."""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ops.lk import optical_flow, LKParams


def make_textured(h=128, w=160, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h // 4, w // 4, 1)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4, 1), np.float32))
    # smooth it a bit so gradients are informative
    k = np.ones((3, 3)) / 9
    from scipy.signal import convolve2d
    img[..., 0] = convolve2d(img[..., 0], k, mode="same", boundary="symm")
    return np.repeat(img, 3, axis=2)


def test_lk_recovers_translation():
    img = make_textured()
    h, w, _ = img.shape
    dx, dy = 3.0, -2.0
    # img2 = img shifted by (dx, dy): img2[y, x] = img[y - dy, x - dx]
    img2 = np.zeros_like(img)
    sy, sx = int(dy), int(dx)
    img2[max(sy, 0):h + min(sy, 0), max(sx, 0):w + min(sx, 0)] = \
        img[max(-sy, 0):h + min(-sy, 0), max(-sx, 0):w + min(-sx, 0)]

    rng = np.random.default_rng(1)
    pts = rng.uniform(0.25, 0.75, (50, 2)).astype(np.float32)
    tracked, err = optical_flow(jnp.asarray(img), jnp.asarray(img2),
                                jnp.asarray(pts), jnp.asarray(pts),
                                jax.random.key(0),
                                LKParams(distance=3, win_size=11, levels=2,
                                         iterations=30))
    tracked = np.asarray(tracked)
    flow = (tracked - pts) * np.array([w - 1, h - 1])
    good = (np.abs(flow[:, 0] - dx) < 0.5) & (np.abs(flow[:, 1] - dy) < 0.5)
    assert good.mean() > 0.8, flow[:5]
