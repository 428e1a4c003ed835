"""Key.Net (reference models/KeyNet.py:99-132): channel-sum input; 3 pyramid
levels (custom_pyrdown factor 1.2 = 5x5 gaussian blur + bilinear downsample);
per level a handcrafted 10-channel sobel-cascade block feeding 3 learnable
5x5 conv+BN+ReLU blocks; per-level features upsampled back to input size,
concatenated, and reduced by a 5x5 conv + ReLU. Detector only (no desc)."""
from __future__ import annotations

import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


def _handcrafted(x):
    dx, dy = c.sobel_gradients(x)
    dxx, dxy = c.sobel_gradients(dx)
    _, dyy = c.sobel_gradients(dy)
    return jnp.concatenate([
        dx, dy, dx ** 2, dy ** 2, dx * dy, dxy, dxy ** 2, dxx, dyy, dxx * dyy,
    ], axis=-1)


def _learnable(x, p):
    for i in (0, 1, 2):
        pre = f"feature_extractor.lb_block.conv{i}"
        x = c.conv2d(x, p[f"{pre}.0.weight"], p.get(f"{pre}.0.bias"), 1, 2)
        x = c.bn_eval(x, p[f"{pre}.1.weight"], p[f"{pre}.1.bias"],
                      p[f"{pre}.1.running_mean"], p[f"{pre}.1.running_var"])
        x = c.relu(x)
    return x


@register("KeyNet")
def keynet(params: dict, image: jnp.ndarray, num_levels: int = 3):
    p = params
    x = jnp.sum(image, axis=-1, keepdims=True)
    h, w = x.shape[1], x.shape[2]
    feats = []
    cur = x
    for i in range(num_levels):
        if i > 0:
            blurred = c.gaussian_pyr_blur(cur)
            nh = int(cur.shape[1] // 1.2)
            nw = int(cur.shape[2] // 1.2)
            cur = c.resize_bilinear_half_pixel(blurred, nh, nw)
        f = _learnable(_handcrafted(cur), p)
        if i > 0:
            f = c.resize_bilinear_half_pixel(f, h, w)
        feats.append(f)
    feats = jnp.concatenate(feats, axis=-1)
    score = c.relu(c.conv2d(feats, p["last_conv.0.weight"],
                            p.get("last_conv.0.bias"), 1, 2))
    return score, None
