"""TPU-fast layouts for the tiny full-resolution detectors (LETNet,
GoodPoint): the same space-to-depth rewrite as models/alike_s2d.py.

These models are 2-3 convs at full res with 3-16 channels — exactly the
shape XLA's 128-lane channel padding punishes hardest (PERF.md). The whole
network runs in the 4x4-block layout (48-256 channels at H/4) and only the
final 4-channel outputs are un-blocked. Exact math: conv kernels are
scattered per block offset, 1x1 convs become block-diagonal, BN/bias
replicate per block position, sigmoid is elementwise.

Registered as 'LETNet_s2d' / 'GoodPoint_s2d'; load_params aliases transform
the original checkpoints (reference models/LETNet.py:31-52,
models/GoodPoint.py:84-111 for the semantics).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.alike_s2d import (_conv_w_s2d, _stem_w8,
                                                 un_s2d)
from keypoint_bench_tpu.models.registry import register

_B = 4


def _block_diag_1x1(W: np.ndarray, b: int) -> np.ndarray:
    ci, co = W.shape[2], W.shape[3]
    out = np.zeros((1, 1, b * b * ci, b * b * co), np.float32)
    for k in range(b * b):
        out[0, 0, k * ci:(k + 1) * ci, k * co:(k + 1) * co] = W[0, 0]
    return out


def _tile(v: np.ndarray, b: int) -> np.ndarray:
    return np.tile(np.asarray(v, np.float32), b * b)


def _transform_common(params: dict, stem: str, bn1: str, conv2: str,
                      bn2: str, heads_1x1, heads_3x3, b: int = _B) -> dict:
    """stem/conv2 are conv3x3 names; heads are lists of conv names."""
    p = dict(params)
    f32 = lambda k: np.asarray(params[k], np.float32)
    w1_blk = _conv_w_s2d(f32(f"{stem}.weight"), b)
    p[f"{stem}.weight_s2d8"] = jnp.asarray(
        _stem_w8(w1_blk, b, f32(f"{stem}.weight").shape[2]))
    p[f"{conv2}.weight_s2d"] = jnp.asarray(
        _conv_w_s2d(f32(f"{conv2}.weight"), b))
    for name in (stem, conv2):
        if f"{name}.bias" in params:
            p[f"{name}.bias_s2d"] = jnp.asarray(_tile(f32(f"{name}.bias"), b))
    for bn in (bn1, bn2):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            p[f"{bn}.{stat}_s2d"] = jnp.asarray(_tile(f32(f"{bn}.{stat}"), b))
    for name in heads_1x1:
        p[f"{name}.weight_s2d"] = jnp.asarray(
            _block_diag_1x1(f32(f"{name}.weight"), b))
        if f"{name}.bias" in params:
            p[f"{name}.bias_s2d"] = jnp.asarray(_tile(f32(f"{name}.bias"), b))
    for name in heads_3x3:
        p[f"{name}.weight_s2d"] = jnp.asarray(
            _conv_w_s2d(f32(f"{name}.weight"), b))
        if f"{name}.bias" in params:
            p[f"{name}.bias_s2d"] = jnp.asarray(_tile(f32(f"{name}.bias"), b))
    return p


def transform_letnet_s2d(params: dict) -> dict:
    return _transform_common(params, "block1.conv1", "block1.bn1",
                             "block1.conv2", "block1.bn2",
                             ["conv1", "conv_head"], [])


def transform_goodpoint_s2d(params: dict) -> dict:
    return _transform_common(params, "block.conv1", "block.bn1",
                             "block.conv2", "block.bn2",
                             ["conv_head1"], ["conv_head2"])


def _stem(p, image, stem: str, bn1: str, b: int = _B):
    w8 = p[f"{stem}.weight_s2d8"]
    dn = jax.lax.conv_dimension_numbers(image.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        image.astype(w8.dtype), w8, (b, b), [(1, b - 1), (1, b - 1)],
        dimension_numbers=dn,
        precision=c._CONV_PRECISION[0],
        preferred_element_type=jnp.bfloat16 if w8.dtype == jnp.bfloat16
        else jnp.float32)
    if f"{stem}.bias_s2d" in p:
        y = y + p[f"{stem}.bias_s2d"]
    return c.relu(c.bn_eval(y, p[f"{bn1}.weight_s2d"], p[f"{bn1}.bias_s2d"],
                            p[f"{bn1}.running_mean_s2d"],
                            p[f"{bn1}.running_var_s2d"]))


def _conv_bn_relu_blk(p, x, conv: str, bn: str, padding: int):
    y = c.conv2d(x, p[f"{conv}.weight_s2d"], p.get(f"{conv}.bias_s2d"), 1,
                 padding)
    return c.relu(c.bn_eval(y, p[f"{bn}.weight_s2d"], p[f"{bn}.bias_s2d"],
                            p[f"{bn}.running_mean_s2d"],
                            p[f"{bn}.running_var_s2d"]))


@register("LETNet_s2d")
def letnet_s2d(params: dict, image):
    p = params
    x = _stem(p, image, "block1.conv1", "block1.bn1")
    x = _conv_bn_relu_blk(p, x, "block1.conv2", "block1.bn2", 1)
    x = c.relu(c.conv2d(x, p["conv1.weight_s2d"], p.get("conv1.bias_s2d"),
                        1, 0))
    x = c.conv2d(x, p["conv_head.weight_s2d"], p.get("conv_head.bias_s2d"),
                 1, 0)
    out = un_s2d(jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype),
                 _B, 4)
    return out[..., 3:4], out[..., 0:3]


@register("GoodPoint_s2d")
def goodpoint_s2d(params: dict, image):
    p = params
    x = _stem(p, image, "block.conv1", "block.bn1")
    x = _conv_bn_relu_blk(p, x, "block.conv2", "block.bn2", 1)
    d = c.conv2d(x, p["conv_head1.weight_s2d"],
                 p.get("conv_head1.bias_s2d"), 1, 0)
    s = c.conv2d(x, p["conv_head2.weight_s2d"],
                 p.get("conv_head2.bias_s2d"), 1, 1)
    d = jax.nn.sigmoid(d.astype(jnp.float32)).astype(d.dtype)
    s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(s.dtype)
    desc_dim = params["conv_head1.weight"].shape[-1]
    return un_s2d(s, _B, 1), un_s2d(d, _B, desc_dim)
