"""GoodPoint (reference models/GoodPoint.py:84-111): one ConvBlock, a 1x1
3-channel sigmoid descriptor head and a 3x3 1-channel sigmoid score head."""
from __future__ import annotations

import jax

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


@register("GoodPoint")
def goodpoint(params: dict, image):
    p = params
    x = c.conv_block(image, p, "block")
    desc = jax.nn.sigmoid(
        c.conv2d(x, p["conv_head1.weight"], p.get("conv_head1.bias"), 1, 0))
    score = jax.nn.sigmoid(
        c.conv2d(x, p["conv_head2.weight"], p.get("conv_head2.bias"), 1, 1))
    return score, desc
