"""ALIKE / ALIKE-t detector-descriptor (re-designed from reference
models/ALike.py:84-164 `ALNet`): ConvBlock encoder + 3 residual blocks with
MaxPool 2/4/4 strides, 4-scale aggregation through 1x1 convs + bilinear
align-corners upsampling, single 1x1 head emitting dim descriptor channels and
one sigmoid score channel.

Functional NHWC form; params are the converted torch state dict
(weights/alike-t.pth), keys unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


@register("Alike")
def alike(params: dict, image: jnp.ndarray):
    """image [B,H,W,3] -> (score [B,H,W,1], desc [B,H,W,dim])."""
    p = params
    x1 = c.conv_block(image, p, "block1")           # H    x c1
    x2 = c.res_block(c.max_pool(x1, 2), p, "block2")  # H/2  x c2
    x3 = c.res_block(c.max_pool(x2, 4), p, "block3")  # H/8  x c3
    x4 = c.res_block(c.max_pool(x3, 4), p, "block4")  # H/32 x c4

    a1 = c.relu(c.conv2d(x1, p["conv1.weight"], p.get("conv1.bias"), 1, 0))
    a2 = c.relu(c.conv2d(x2, p["conv2.weight"], p.get("conv2.bias"), 1, 0))
    a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
    a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))

    a2 = c.upsample_bilinear_align(a2, 2)
    a3 = c.upsample_bilinear_align(a3, 8)
    a4 = c.upsample_bilinear_align(a4, 32)
    agg = jnp.concatenate([a1, a2, a3, a4], axis=-1)

    head = c.conv2d(agg, p["convhead2.weight"], p.get("convhead2.bias"), 1, 0)
    desc = head[..., :-1]
    score = jax.nn.sigmoid(head[..., -1:])
    return score, desc
