"""XFeat (reference models/XFeat.py:22-140): grayscale mean + InstanceNorm,
5-block strided encoder with an avgpool skip, pyramid fusion at H/8
(half-pixel bilinear), L2-normalized 64-d features; keypoint head on the
8x8-unfolded raw input -> 65 logits -> softmax -> depth-to-space heatmap."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


def _basic(x, p, prefix, stride=1, padding=1):
    """BasicLayer: conv(bias=False) + BN(affine=False) + ReLU (XFeat.py:7-19)."""
    x = c.conv2d(x, p[f"{prefix}.layer.0.weight"], None, stride, padding)
    x = c.bn_eval(x, 1.0, 0.0, p[f"{prefix}.layer.1.running_mean"],
                  p[f"{prefix}.layer.1.running_var"])
    return c.relu(x)


def _unfold8(x):
    """[B,H,W,1] -> [B,H/8,W/8,64], channel = h_off*8 + w_off (row-major),
    matching torch unfold(2,ws,ws).unfold(3,ws,ws) layout (XFeat.py:96-102)."""
    b, h, w, _ = x.shape
    y = x[..., 0].reshape(b, h // 8, 8, w // 8, 8)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(b, h // 8, w // 8, 64)


@register("XFeat")
def xfeat(params: dict, image: jnp.ndarray):
    p = params
    x = jnp.mean(image, axis=-1, keepdims=True)
    x = c.instance_norm(x)

    x1 = x
    for i in range(4):
        x1 = _basic(x1, p, f"block1.{i}", stride=2 if i in (1, 3) else 1)
    skip = c.conv2d(c.avg_pool(x, 4), p["skip1.1.weight"],
                    p.get("skip1.1.bias"), 1, 0)
    x2 = x1 + skip
    for i in range(2):
        x2 = _basic(x2, p, f"block2.{i}")
    x3 = _basic(x2, p, "block3.0", stride=2)
    x3 = _basic(x3, p, "block3.1")
    x3 = _basic(x3, p, "block3.2", padding=0)  # 1x1
    x4 = _basic(x3, p, "block4.0", stride=2)
    x4 = _basic(x4, p, "block4.1")
    x4 = _basic(x4, p, "block4.2")
    x5 = _basic(x4, p, "block5.0", stride=2)
    x5 = _basic(x5, p, "block5.1")
    x5 = _basic(x5, p, "block5.2")
    x5 = _basic(x5, p, "block5.3", padding=0)  # 1x1

    h3, w3 = x3.shape[1], x3.shape[2]
    x4u = c.resize_bilinear_half_pixel(x4, h3, w3)
    x5u = c.resize_bilinear_half_pixel(x5, h3, w3)
    f = x3 + x4u + x5u
    f = _basic(f, p, "block_fusion.0")
    f = _basic(f, p, "block_fusion.1")
    feats = c.conv2d(f, p["block_fusion.2.weight"],
                     p.get("block_fusion.2.bias"), 1, 0)
    feats = c.l2_normalize(feats, axis=-1)

    k = _unfold8(x)
    for i in range(3):
        k = _basic(k, p, f"keypoint_head.{i}", padding=0)
    logits = c.conv2d(k, p["keypoint_head.3.weight"],
                      p.get("keypoint_head.3.bias"), 1, 0)
    heat = c.depth_to_space(jax.nn.softmax(logits, axis=-1)[..., :64], 8)
    return heat, feats
