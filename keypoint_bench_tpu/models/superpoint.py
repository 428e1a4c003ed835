"""SuperPoint (reference models/SuperPoint.py:6-71): channel-sum to grayscale,
VGG-style encoder with 3 maxpools, 65-channel detector head -> softmax -> drop
dustbin -> 8x8 depth-to-space heatmap; 256-d L2-normalized descriptors at H/8."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


@register("SuperPoint")
def superpoint(params: dict, image):
    p = params
    x = jnp.sum(image, axis=-1, keepdims=True)  # torch.sum over RGB (line 47)

    def cr(x, name, pad=1):
        return c.relu(c.conv2d(x, p[f"{name}.weight"], p.get(f"{name}.bias"),
                               1, pad))

    x = cr(x, "conv1a"); x = cr(x, "conv1b"); x = c.max_pool(x, 2)
    x = cr(x, "conv2a"); x = cr(x, "conv2b"); x = c.max_pool(x, 2)
    x = cr(x, "conv3a"); x = cr(x, "conv3b"); x = c.max_pool(x, 2)
    x = cr(x, "conv4a"); x = cr(x, "conv4b")

    cpa = cr(x, "convPa")
    semi = c.conv2d(cpa, p["convPb.weight"], p.get("convPb.bias"), 1, 0)
    cda = cr(x, "convDa")
    desc = c.conv2d(cda, p["convDb.weight"], p.get("convDb.bias"), 1, 0)
    desc = c.l2_normalize(desc, axis=-1)

    dense = jax.nn.softmax(semi, axis=-1)
    heat = c.depth_to_space(dense[..., :-1], 8)
    return heat, desc
