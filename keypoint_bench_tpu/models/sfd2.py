"""SFD2 ResSegNetV2 (reference models/sfd2.py:90-185): conv stem with two
stride-2 stages, 3 grouped (groups=32) residual bottleneck blocks at H/4,
SuperPoint-style 65-channel exp-normalized score head at H/8 (convPa stride 2)
-> depth-to-space; 128-d L2-normalized descriptors at H/4; 3-class stability
head upsampled to full res and quantized to {0.1, 0.5, 1.0}, multiplying the
score map."""
from __future__ import annotations

import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register


def _conv_bn_relu_nf(x, p, prefix, stride=1):
    """`conv(..., relu=True, use_bn=True)` (sfd2.py:62-88): conv+bias, BN
    affine=False, ReLU."""
    x = c.conv2d(x, p[f"{prefix}.0.weight"], p.get(f"{prefix}.0.bias"),
                 stride, 1)
    x = c.bn_eval(x, 1.0, 0.0, p[f"{prefix}.1.running_mean"],
                  p[f"{prefix}.1.running_var"])
    return c.relu(x)


def _res_block(x, p, prefix):
    """Grouped bottleneck (sfd2.py:17-46): 1x1 + BN + relu, grouped 3x3 + BN
    + relu, 1x1 + BN, add, relu. BNs have affine params."""
    def bn(y, name):
        return c.bn_eval(y, p[f"{name}.weight"], p[f"{name}.bias"],
                         p[f"{name}.running_mean"], p[f"{name}.running_var"])
    out = c.relu(bn(c.conv2d(x, p[f"{prefix}.conv1.weight"], None, 1, 0),
                    f"{prefix}.bn1"))
    out = c.relu(bn(c.conv2d(out, p[f"{prefix}.conv2.weight"], None, 1, 1,
                             groups=32), f"{prefix}.bn2"))
    out = bn(c.conv2d(out, p[f"{prefix}.conv3.weight"], None, 1, 0),
             f"{prefix}.bn3")
    return c.relu(out + x)


@register("sfd2")
def sfd2(params: dict, image: jnp.ndarray):
    p = params
    x = _conv_bn_relu_nf(image, p, "conv1a")
    x = c.conv2d(x, p["conv1b.0.weight"], p.get("conv1b.0.bias"), 2, 1)
    x = c.relu(c.bn_eval(x, 1.0, 0.0, p["bn1b.0.running_mean"],
                         p["bn1b.0.running_var"]))
    x = _conv_bn_relu_nf(x, p, "conv2a")
    x = c.conv2d(x, p["conv2b.0.weight"], p.get("conv2b.0.bias"), 2, 1)
    x = c.relu(c.bn_eval(x, 1.0, 0.0, p["bn2b.0.running_mean"],
                         p["bn2b.0.running_var"]))
    x = _conv_bn_relu_nf(x, p, "conv3a")
    x = c.conv2d(x, p["conv3b.0.weight"], p.get("conv3b.0.bias"), 1, 1)
    x = c.relu(c.bn_eval(x, 1.0, 0.0, p["bn3b.0.running_mean"],
                         p["bn3b.0.running_var"]))
    for i in range(3):
        x = _res_block(x, p, f"conv4.{i}")

    # detector head (convPa stride 2 -> H/8)
    def bn_aff(y, name):
        return c.bn_eval(y, p[f"{name}.weight"], p[f"{name}.bias"],
                         p[f"{name}.running_mean"], p[f"{name}.running_var"])
    cpa = c.conv2d(x, p["convPa.0.weight"], p.get("convPa.0.bias"), 2, 1)
    cpa = c.relu(bn_aff(cpa, "convPa.1"))
    cpa = c.conv2d(cpa, p["convPa.3.weight"], p.get("convPa.3.bias"), 1, 1)
    semi = jnp.exp(c.conv2d(cpa, p["convPb.weight"], p.get("convPb.bias"),
                            1, 0))
    semi = semi / (jnp.sum(semi, axis=-1, keepdims=True) + 1e-5)
    score = c.depth_to_space(semi[..., :-1], 8)

    cda = c.conv2d(x, p["convDa.0.weight"], p.get("convDa.0.bias"), 1, 1)
    cda = c.relu(bn_aff(cda, "convDa.1"))
    cda = c.conv2d(cda, p["convDa.3.weight"], p.get("convDa.3.bias"), 1, 1)
    desc = c.conv2d(cda, p["convDb.weight"], p.get("convDb.bias"), 1, 0)
    desc = c.l2_normalize(desc, axis=-1)

    # stability head (sfd2.py:136-142,179-182)
    sta = c.conv2d(x, p["ConvSta.weight"], p.get("ConvSta.bias"), 1, 0)
    sta = c.resize_bilinear_half_pixel(sta, image.shape[1], image.shape[2])
    cls = jnp.argmax(sta, axis=-1, keepdims=True)
    stab = jnp.where(cls == 0, 0.1, jnp.where(cls == 1, 0.5, 1.0))
    return score * stab, desc
