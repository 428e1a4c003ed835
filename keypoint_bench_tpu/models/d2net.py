"""D2-Net (reference models/D2_Net.py:84-105): VGG16 features to conv4_3
(convs with bias, 3 maxpools, relu4_3 excluded), soft local-max detection
(exp ratio inside 3x3 windows with constant-1 padding x channel-max ratio,
sum-normalized), bilinear align-corners upsample of the score to full res;
512-d L2-normalized descriptor map at H/8."""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.registry import register

# torchvision VGG16 `features` indices up to conv4_3 ("M" = maxpool 2)
_VGG = [0, 2, "M", 5, 7, "M", 10, 12, 14, "M", 17, 19, 21]


def _vgg_features(p, image):
    x = image
    for i, idx in enumerate(_VGG):
        if idx == "M":
            x = c.max_pool(x, 2)
        else:
            key = f"dense_feature_extraction.model.{idx}"
            x = c.conv2d(x, p[f"{key}.weight"], p.get(f"{key}.bias"), 1, 1)
            if i != len(_VGG) - 1:  # reference stops at conv4_3, pre-relu
                x = c.relu(x)
    return x


def _soft_detection(batch):
    """SoftDetectionModule (D2_Net.py:49-81), NHWC input [B,H,W,C]."""
    b = batch.shape[0]
    batch = c.relu(batch)
    max_per_sample = jnp.max(batch.reshape(b, -1), axis=1)
    exp = jnp.exp(batch / max_per_sample.reshape(b, 1, 1, 1))
    padded = jnp.pad(exp, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=1.0)
    sum_exp = lax.reduce_window(padded, 0.0, lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "VALID")
    local_max_score = exp / sum_exp
    depth_wise_max = jnp.max(batch, axis=-1, keepdims=True)
    all_scores = local_max_score * (batch / depth_wise_max)
    score = jnp.max(all_scores, axis=-1)
    score = score / jnp.sum(score.reshape(b, -1), axis=1).reshape(b, 1, 1)
    return score[..., None]


@register("D2Net")
def d2net(params: dict, image: jnp.ndarray):
    feat = _vgg_features(params, image)
    score = _soft_detection(feat)
    score = c.resize_bilinear_align(score, image.shape[1], image.shape[2])
    desc = c.l2_normalize(feat, axis=-1)
    return score, desc
