"""Adaptive LightGlue: depth early-exit + width pruning with fixed shapes.

The reference's default configuration (models/lightglue.py:344-346:
depth_confidence=0.95, width_confidence=0.99) stops iterating once enough
tokens are confident and prunes unmatchable points between layers — both via
data-dependent Python control flow and dynamic shapes (lightglue.py:561-589).

TPU re-design: a `lax.while_loop` over layers with per-layer parameters
stacked along a leading axis (dynamic-sliced per iteration), and pruning as
*mask shrinking* instead of gathers — pruned points leave the attention via
the validity mask while every shape stays static. On CPU/TPU the reference
always prunes (its pruning threshold for non-CUDA devices is -1,
lightglue.py:352-356), which this reproduces.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models.lightglue import (_assignment_scores,
                                                 _cross_block, _linear,
                                                 _posenc, _self_block,
                                                 normalize_keypoints_masked)


def stack_layer_params(params: dict, n_layers: int = 9):
    """Split a flat LightGlue param dict into (static, per-layer-stacked).
    Stacked entries are keyed by their suffix (e.g. 'self_attn.Wqkv.weight')
    with a leading [n_layers] axis; token_confidence has n_layers-1 entries
    padded with the last layer's (never read at the final layer)."""
    static, layered = {}, {}
    for k, v in params.items():
        if k.startswith("transformers.0."):
            suffix = k[len("transformers.0."):]
            layered[suffix] = jnp.stack(
                [params[f"transformers.{i}.{suffix}"]
                 for i in range(n_layers)])
        elif k.startswith("log_assignment.0."):
            suffix = k[len("log_assignment.0."):]
            layered[f"assign.{suffix}"] = jnp.stack(
                [params[f"log_assignment.{i}.{suffix}"]
                 for i in range(n_layers)])
        elif k.startswith("token_confidence.0."):
            suffix = k[len("token_confidence.0."):]
            rows = [params[f"token_confidence.{i}.{suffix}"]
                    for i in range(n_layers - 1)]
            rows.append(rows[-1])
            layered[f"conf.{suffix}"] = jnp.stack(rows)
        elif not (k.startswith("transformers.")
                  or k.startswith("log_assignment.")
                  or k.startswith("token_confidence.")):
            static[k] = v
    return static, layered


def _conf_thresholds(n_layers: int) -> jnp.ndarray:
    """lightglue.py:653-656: 0.8 + 0.1 * exp(-4 i / L), clipped to [0, 1]."""
    i = np.arange(n_layers)
    return jnp.asarray(np.clip(0.8 + 0.1 * np.exp(-4.0 * i / n_layers), 0, 1))


@functools.partial(jax.jit, static_argnames=("n_layers", "num_heads",
                                             "filter_threshold",
                                             "depth_confidence",
                                             "width_confidence"))
def lightglue_forward_adaptive(params: dict, kpts0_px, valid0, desc0,
                               kpts1_px, valid1, desc1, n_layers: int = 9,
                               num_heads: int = 4,
                               filter_threshold: float = 0.1,
                               depth_confidence: float = 0.95,
                               width_confidence: float = 0.99):
    """Adaptive-mode forward. Returns (m0, mscores0, match_mask, stop_layer)."""
    static, layered = stack_layer_params(params, n_layers)
    if "input_proj.weight" in static:
        desc0 = _linear(static, "input_proj", desc0)
        desc1 = _linear(static, "input_proj", desc1)
    enc0 = _posenc(static, normalize_keypoints_masked(kpts0_px, valid0))
    enc1 = _posenc(static, normalize_keypoints_masked(kpts1_px, valid1))
    conf_th = _conf_thresholds(n_layers)
    m_count = jnp.sum(valid0) + jnp.sum(valid1)

    def layer_params(i):
        p = {f"L.{k}": v[i] for k, v in layered.items()}
        return p

    def body(state):
        i, d0, d1, a0, a1, _stop = state
        p = layer_params(i)
        d0 = _self_block(p, "L.self_attn", d0, enc0, a0, num_heads)
        d1 = _self_block(p, "L.self_attn", d1, enc1, a1, num_heads)
        d0, d1 = _cross_block(p, "L.cross_attn", d0, d1, a0, a1, num_heads)

        # token confidence (lightglue.py:97-107, 668-679)
        c0 = jax.nn.sigmoid(_linear(p, "L.conf.token.0", d0))[:, 0]
        c1 = jax.nn.sigmoid(_linear(p, "L.conf.token.0", d1))[:, 0]
        th = conf_th[i]
        n_low = (jnp.sum((c0 < th) & a0) + jnp.sum((c1 < th) & a1))
        ratio_conf = 1.0 - n_low / jnp.maximum(m_count, 1)
        stop = ratio_conf > depth_confidence

        # width pruning (lightglue.py:657-666, 574-589) as mask shrinking
        def matchability(d):
            return jax.nn.sigmoid(_linear(p, "L.assign.matchability", d))[:, 0]
        keep0 = (matchability(d0) > (1 - width_confidence)) | (c0 <= th)
        keep1 = (matchability(d1) > (1 - width_confidence)) | (c1 <= th)
        last = i == n_layers - 1
        do_prune = jnp.logical_not(stop | last)
        a0 = jnp.where(do_prune, a0 & keep0, a0)
        a1 = jnp.where(do_prune, a1 & keep1, a1)
        return i + 1, d0, d1, a0, a1, stop | last

    def cond(state):
        i, _, _, _, _, stop = state
        return jnp.logical_not(stop) & (i < n_layers)

    i_fin, d0, d1, a0, a1, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), desc0, desc1, valid0, valid1,
                     jnp.bool_(False)))
    stop_layer = i_fin - 1

    ap = {f"A.{k[len('assign.'):]}": v[stop_layer]
          for k, v in layered.items() if k.startswith("assign.")}
    scores = _assignment_scores(ap, "A", d0, d1, a0, a1)
    m0 = jnp.argmax(scores, axis=1)
    m1 = jnp.argmax(scores, axis=0)
    k0 = scores.shape[0]
    mutual0 = m1[m0] == jnp.arange(k0)
    max0 = jnp.take_along_axis(scores, m0[:, None], axis=1)[:, 0]
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    ok = mutual0 & (mscores0 > filter_threshold) & a0 & a1[m0]
    return jnp.where(ok, m0, -1), mscores0, ok, i_fin
