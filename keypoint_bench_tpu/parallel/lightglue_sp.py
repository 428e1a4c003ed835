"""Sequence-parallel LightGlue: keypoint tokens sharded over the 'data' mesh
axis, every attention (rotary self + bidirectional cross) computed as ring
attention with ppermute-rotated KV chunks (SURVEY.md §5.7: "ring/blockwise
attention over keypoint-set tokens in LightGlue for huge N").

Each shard owns K/n contiguous tokens of both sets: projections, rotary
encoding, and FFNs are row-local; the O(K^2) similarity never materializes
globally. The final assignment gathers the (small, d=256) refined
descriptors once and reuses the dense masked assignment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from keypoint_bench_tpu.models.lightglue import (_assignment_scores, _ffn,
                                                 _linear, _apply_rotary,
                                                 normalize_keypoints_masked)
from keypoint_bench_tpu.parallel.ring_attention import _ring_attention_shard

_AXIS = "data"


def _posenc_rows(p, kpts_rows):
    proj = jnp.matmul(kpts_rows, p["posenc.Wr.weight"])
    emb = jnp.stack([jnp.cos(proj), jnp.sin(proj)], axis=0)
    return jnp.repeat(emb, 2, axis=-1)


def _self_block_ring(p, prefix, x, enc, valid, num_heads):
    qkv = _linear(p, f"{prefix}.Wqkv", x)
    n = x.shape[0]
    qkv = qkv.reshape(n, num_heads, -1, 3)
    q = _apply_rotary(enc, qkv[..., 0].transpose(1, 0, 2))
    k = _apply_rotary(enc, qkv[..., 1].transpose(1, 0, 2))
    v = qkv[..., 2].transpose(1, 0, 2)
    ctx = _ring_attention_shard(q, k, v, valid)
    msg = _linear(p, f"{prefix}.out_proj",
                  ctx.transpose(1, 0, 2).reshape(n, -1))
    return x + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x, msg], axis=-1))


def _cross_block_ring(p, prefix, x0, x1, valid0, valid1, num_heads):
    def heads(t):
        n, d = t.shape
        return t.reshape(n, num_heads, d // num_heads).transpose(1, 0, 2)

    qk0 = heads(_linear(p, f"{prefix}.to_qk", x0))
    qk1 = heads(_linear(p, f"{prefix}.to_qk", x1))
    v0 = heads(_linear(p, f"{prefix}.to_v", x0))
    v1 = heads(_linear(p, f"{prefix}.to_v", x1))
    m0 = _ring_attention_shard(qk0, qk1, v1, valid1)
    m1 = _ring_attention_shard(qk1, qk0, v0, valid0)

    def merge(t):
        h, n, dh = t.shape
        return t.transpose(1, 0, 2).reshape(n, h * dh)

    m0 = _linear(p, f"{prefix}.to_out", merge(m0))
    m1 = _linear(p, f"{prefix}.to_out", merge(m1))
    x0 = x0 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x0, m0], axis=-1))
    x1 = x1 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x1, m1], axis=-1))
    return x0, x1


def lightglue_forward_sp(mesh, params: dict, kpts0_px, valid0, desc0,
                         kpts1_px, valid1, desc1, n_layers: int = 9,
                         num_heads: int = 4, filter_threshold: float = 0.1):
    """Ring-attention LightGlue. The 'data' axis size must divide K0 and K1.
    Same outputs as lightglue_forward."""
    # normalization stats need the global sets: compute outside the shards
    k0n = normalize_keypoints_masked(kpts0_px, valid0)
    k1n = normalize_keypoints_masked(kpts1_px, valid1)

    def fwd(k0n_r, v0, d0, k1n_r, v1, d1):
        p = params
        if "input_proj.weight" in p:
            d0 = _linear(p, "input_proj", d0)
            d1 = _linear(p, "input_proj", d1)
        enc0 = _posenc_rows(p, k0n_r)
        enc1 = _posenc_rows(p, k1n_r)
        for i in range(n_layers):
            d0 = _self_block_ring(p, f"transformers.{i}.self_attn", d0,
                                  enc0, v0, num_heads)
            d1 = _self_block_ring(p, f"transformers.{i}.self_attn", d1,
                                  enc1, v1, num_heads)
            d0, d1 = _cross_block_ring(p, f"transformers.{i}.cross_attn",
                                       d0, d1, v0, v1, num_heads)
        return d0, d1

    mapped = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS),
                  P(_AXIS)),
        out_specs=(P(_AXIS), P(_AXIS)))
    d0, d1 = jax.jit(mapped)(k0n, valid0, desc0, k1n, valid1, desc1)

    scores = _assignment_scores(params, f"log_assignment.{n_layers - 1}",
                                d0, d1, valid0, valid1)
    m0 = jnp.argmax(scores, axis=1)
    m1 = jnp.argmax(scores, axis=0)
    kk = scores.shape[0]
    mutual0 = m1[m0] == jnp.arange(kk)
    max0 = jnp.take_along_axis(scores, m0[:, None], axis=1)[:, 0]
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    ok = mutual0 & (mscores0 > filter_threshold) & valid0 & valid1[m0]
    return jnp.where(ok, m0, -1), mscores0, ok
