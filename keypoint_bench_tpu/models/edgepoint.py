"""EdgePoint (reference models/EdgePoint.py:84-175): ALIKE-family encoder;
descriptors aggregated at H/8 via strided 1x1 convs (x1: stride 8, x2: stride
4) and a 4x4/stride-4 ConvTranspose for x4; 1x1 score head on the full-res x1
branch. Score map is raw (no sigmoid); desc map is dim-D at H/8."""
from __future__ import annotations

import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


@register("EdgePoint")
def edgepoint(params: dict, image: jnp.ndarray):
    p = params
    x1 = c.conv_block(image, p, "block1")
    x2 = c.res_block(c.max_pool(x1, 2), p, "block2")
    x3 = c.res_block(c.max_pool(x2, 4), p, "block3")
    x4 = c.res_block(c.max_pool(x3, 4), p, "block4")

    a1 = c.relu(c.conv2d(x1, p["conv1.weight"], p.get("conv1.bias"), 1, 0))
    a2 = c.relu(c.conv2d(x2, p["conv2.weight"], p.get("conv2.bias"), 1, 0))
    a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
    a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))

    x1_desc = c.conv2d(a1, p["conv_8.weight"], p.get("conv_8.bias"), 8, 0)
    x2_desc = c.conv2d(a2, p["conv_4.weight"], p.get("conv_4.bias"), 4, 0)
    x4_desc = c.conv_transpose2d(a4, p["conv_transpose_4.weight"],
                                 p.get("conv_transpose_4.bias"), 4)
    agg = jnp.concatenate([x1_desc, x2_desc, a3, x4_desc], axis=-1)

    desc = c.conv2d(agg, p["convhead2.weight"], p.get("convhead2.bias"), 1, 0)
    score = c.conv2d(a1, p["conv_score.weight"], p.get("conv_score.bias"), 1, 0)
    return score, desc
