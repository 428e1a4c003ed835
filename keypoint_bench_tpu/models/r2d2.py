"""R2D2 Quad_L2Net_ConfCFS (reference models/r2d2.py:36-141): dilated L2-Net
patch network — 6 3x3 convs with dilation doubling at the virtual-stride
layers, then three 2x2 dilated convs; BatchNorm without affine; heads on x^2:
2-channel reliability (softmax[:,1]) and 1-channel repeatability
(softplus/(1+softplus)); score = product, desc = L2-normalized 128-d full-res."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register

# (ops index of conv, kernel, dilation, has_bn, has_relu, padding)
_LAYERS = [
    (0, 3, 1, True, True, 1),
    (3, 3, 1, True, True, 1),
    (6, 3, 1, True, True, 1),    # dilation *= 2 after
    (9, 3, 2, True, True, 2),
    (12, 3, 2, True, True, 2),   # dilation *= 2 after
    (15, 3, 4, True, True, 4),
    (18, 2, 4, True, False, 2),  # k=2 convs: pad ((k-1)*d)//2
    (20, 2, 8, True, False, 4),
    (22, 2, 16, False, False, 8),
]


@register("r2d2")
def r2d2(params: dict, image: jnp.ndarray):
    p = params
    x = image
    for idx, k, dil, has_bn, has_relu, pad in _LAYERS:
        x = c.conv2d(x, p[f"ops.{idx}.weight"], p.get(f"ops.{idx}.bias"),
                     1, pad, dilation=dil)
        if has_bn:
            x = c.bn_eval(x, 1.0, 0.0, p[f"ops.{idx+1}.running_mean"],
                          p[f"ops.{idx+1}.running_var"])
        if has_relu:
            x = c.relu(x)
    x2 = x * x
    urel = c.conv2d(x2, p["clf.weight"], p.get("clf.bias"), 1, 0)
    urep = c.conv2d(x2, p["sal.weight"], p.get("sal.bias"), 1, 0)
    rel = jax.nn.softmax(urel, axis=-1)[..., 1:2]
    sp = jax.nn.softplus(urep)
    rep = sp / (1 + sp)
    desc = c.l2_normalize(x, axis=-1)
    return rep * rel, desc
