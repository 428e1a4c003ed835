"""DISK (reference models/disk.py:233-313): thin U-Net with PReLU gates and
InstanceNorm (DEFAULT_SETUP: padding=True, bias=True), down [16,32,64,64,64]
via avg-pool 2, up [64,64,64,129] via half-pixel bilinear x2 upsampling and
skip concatenation; desc = L2-normalized 128 channels, score = sigmoid(last)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


def _conv_unit(x, p, prefix, first=False):
    """DISK `Conv` (disk.py:79-99): InstanceNorm -> PReLU -> conv5x5(pad 2),
    norm/gate skipped for the very first block."""
    if not first:
        x = c.instance_norm(x)
        x = c.prelu(x, p[f"{prefix}.1.weight"])
    return c.conv2d(x, p[f"{prefix}.3.weight"], p.get(f"{prefix}.3.bias"),
                    1, 2)


@register("DISK")
def disk(params: dict, image: jnp.ndarray):
    p = params
    feats = [image]
    x = image
    for i in range(5):
        if i > 0:
            x = c.avg_pool(x, 2)
        x = _conv_unit(x, p, f"unet.path_down.{i}.1", first=(i == 0))
        feats.append(x)

    bot = feats[-1]
    hors = feats[-2::-1]
    for i in range(4):
        b, h, w, _ = bot.shape
        bot_big = c.resize_bilinear_half_pixel(bot, h * 2, w * 2)
        combined = jnp.concatenate([bot_big, hors[i]], axis=-1)
        bot = _conv_unit(combined, p, f"unet.path_up.{i}.conv")

    desc = c.l2_normalize(bot[..., :128], axis=-1)
    score = jax.nn.sigmoid(bot[..., 128:])
    return score, desc
