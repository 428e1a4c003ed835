"""LETNet (reference models/LETNet.py:31-52): ConvBlock + 1x1 conv + ReLU +
1x1 head -> 4 channels; ch3 sigmoid score, ch0-2 sigmoid local descriptor."""
from __future__ import annotations

import jax

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


@register("LETNet")
def letnet(params: dict, image):
    p = params
    x = c.conv_block(image, p, "block1")
    x = c.relu(c.conv2d(x, p["conv1.weight"], p.get("conv1.bias"), 1, 0))
    x = c.conv2d(x, p["conv_head.weight"], p.get("conv_head.bias"), 1, 0)
    score = jax.nn.sigmoid(x[..., 3:4])
    desc = jax.nn.sigmoid(x[..., 0:3])
    return score, desc
