"""Tensor-parallel LightGlue: attention heads sharded over the 'model' mesh
axis (Ulysses/Megatron-style, SURVEY.md §2.7 TP row).

Per shard: a slice of the QKV / to_qk / to_v projection columns produces the
local heads, attention runs locally over the full keypoint sets, and the
output projection is row-sliced with a psum to rebuild the full message.
The FFN stays replicated (it follows a LayerNorm over the full feature, and at
LightGlue's d=256 it is not the bottleneck — the O(K^2) attention is).

Weight slicing happens once on host (`shard_lightglue_params`); the forward is
a `shard_map` over the mesh with psums over 'model'.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from keypoint_bench_tpu.models.lightglue import (_assignment_scores, _ffn,
                                                 _posenc, _apply_rotary,
                                                 _linear,
                                                 normalize_keypoints_masked)

_AXIS = "model"


def shard_lightglue_params(params: dict, n_shards: int, n_layers: int = 9,
                           num_heads: int = 4) -> dict:
    """Slice attention projections per shard: returns a dict where sharded
    tensors get a leading [n_shards] axis and everything else is replicated.

    Wqkv columns are laid out [heads, dh, 3] (lightglue.py:178-180), so a
    contiguous column block = a head block."""
    assert num_heads % n_shards == 0
    out = {}
    for k, v in params.items():
        out[k] = v
    for i in range(n_layers):
        sp = f"transformers.{i}.self_attn"
        w = np.asarray(params[f"{sp}.Wqkv.weight"])   # [d, 3d]
        b = np.asarray(params[f"{sp}.Wqkv.bias"])     # [3d]
        d = w.shape[0]
        out[f"{sp}.Wqkv.weight"] = jnp.asarray(
            w.reshape(d, n_shards, -1).transpose(1, 0, 2))
        out[f"{sp}.Wqkv.bias"] = jnp.asarray(b.reshape(n_shards, -1))
        wo = np.asarray(params[f"{sp}.out_proj.weight"])  # [d, d] rows=heads
        out[f"{sp}.out_proj.weight"] = jnp.asarray(
            wo.reshape(n_shards, d // n_shards, d))
        cp = f"transformers.{i}.cross_attn"
        for name in ("to_qk", "to_v"):
            w = np.asarray(params[f"{cp}.{name}.weight"])  # [d, d] cols=heads
            b = np.asarray(params[f"{cp}.{name}.bias"])
            out[f"{cp}.{name}.weight"] = jnp.asarray(
                w.reshape(d, n_shards, -1).transpose(1, 0, 2))
            out[f"{cp}.{name}.bias"] = jnp.asarray(b.reshape(n_shards, -1))
        wo = np.asarray(params[f"{cp}.to_out.weight"])
        out[f"{cp}.to_out.weight"] = jnp.asarray(
            wo.reshape(n_shards, d // n_shards, d))
    return out


def _heads_local(x, n_local):
    n, d = x.shape
    return x.reshape(n, n_local, d // n_local).transpose(1, 0, 2)


def _merge_local(x):
    h, n, dh = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * dh)


def _attn(q, k, v, mask_kv):
    s = q.shape[-1] ** -0.5
    sim = jnp.einsum("hid,hjd->hij", q, k) * s
    sim = jnp.where(mask_kv[None, None, :], sim, -1e9)
    return jnp.einsum("hij,hjd->hid", jax.nn.softmax(sim, axis=-1), v)


def _self_block_tp(p, prefix, x, enc, valid, n_local):
    wq = p[f"{prefix}.Wqkv.weight"]   # [d, local_cols] (per-shard slice)
    bq = p[f"{prefix}.Wqkv.bias"]
    qkv = jnp.matmul(x, wq) + bq      # [N, n_local*dh*3]
    n = x.shape[0]
    qkv = qkv.reshape(n, n_local, -1, 3)
    q = qkv[..., 0].transpose(1, 0, 2)
    k = qkv[..., 1].transpose(1, 0, 2)
    v = qkv[..., 2].transpose(1, 0, 2)
    q = _apply_rotary(enc, q)
    k = _apply_rotary(enc, k)
    ctx = _attn(q, k, v, valid)
    partial = jnp.matmul(_merge_local(ctx), p[f"{prefix}.out_proj.weight"])
    msg = jax.lax.psum(partial, _AXIS) + p[f"{prefix}.out_proj.bias"]
    return x + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x, msg], axis=-1))


def _cross_block_tp(p, prefix, x0, x1, valid0, valid1, n_local):
    def proj(name, x):
        return jnp.matmul(x, p[f"{prefix}.{name}.weight"]) \
            + p[f"{prefix}.{name}.bias"]

    qk0 = _heads_local(proj("to_qk", x0), n_local)
    qk1 = _heads_local(proj("to_qk", x1), n_local)
    v0 = _heads_local(proj("to_v", x0), n_local)
    v1 = _heads_local(proj("to_v", x1), n_local)
    scale = qk0.shape[-1] ** -0.5
    qk0 = qk0 * scale ** 0.5
    qk1 = qk1 * scale ** 0.5
    sim = jnp.einsum("hid,hjd->hij", qk0, qk1)
    sim01 = jnp.where(valid1[None, None, :], sim, -1e9)
    sim10 = jnp.where(valid0[None, :, None], sim, -1e9)
    m0 = jnp.einsum("hij,hjd->hid", jax.nn.softmax(sim01, axis=-1), v1)
    m1 = jnp.einsum("hij,hid->hjd", jax.nn.softmax(sim10, axis=-2), v0)
    wo = p[f"{prefix}.to_out.weight"]
    bo = p[f"{prefix}.to_out.bias"]
    m0 = jax.lax.psum(jnp.matmul(_merge_local(m0), wo), _AXIS) + bo
    m1 = jax.lax.psum(jnp.matmul(_merge_local(m1), wo), _AXIS) + bo
    x0 = x0 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x0, m0], axis=-1))
    x1 = x1 + _ffn(p, f"{prefix}.ffn", jnp.concatenate([x1, m1], axis=-1))
    return x0, x1


def lightglue_forward_tp(mesh, sharded_params: dict, kpts0_px, valid0, desc0,
                         kpts1_px, valid1, desc1, n_layers: int = 9,
                         num_heads: int = 4, filter_threshold: float = 0.1):
    """Head-sharded LightGlue forward over mesh axis 'model'.

    sharded_params from `shard_lightglue_params(params, mesh.shape['model'])`.
    Same outputs as models.lightglue.lightglue_forward."""
    n_shards = mesh.shape[_AXIS]
    n_local = num_heads // n_shards

    shard_axes = {}
    for k, v in sharded_params.items():
        is_sharded = (".Wqkv." in k or ".out_proj.weight" in k
                      or ".to_qk." in k or ".to_v." in k
                      or ".to_out.weight" in k)
        shard_axes[k] = P(_AXIS) if is_sharded else P()

    def fwd(p, k0, v0, d0, k1, v1, d1):
        # per-shard view: sharded tensors arrive with their leading shard
        # axis of size 1 — drop it
        p = {key: (val[0] if shard_axes[key] != P() else val)
             for key, val in p.items()}
        if "input_proj.weight" in p:
            d0 = _linear(p, "input_proj", d0)
            d1 = _linear(p, "input_proj", d1)
        enc0 = _posenc(p, normalize_keypoints_masked(k0, v0))
        enc1 = _posenc(p, normalize_keypoints_masked(k1, v1))
        # rotary freqs are per full head_dim; identical for every head
        for i in range(n_layers):
            d0 = _self_block_tp(p, f"transformers.{i}.self_attn", d0, enc0,
                                v0, n_local)
            d1 = _self_block_tp(p, f"transformers.{i}.self_attn", d1, enc1,
                                v1, n_local)
            d0, d1 = _cross_block_tp(p, f"transformers.{i}.cross_attn",
                                     d0, d1, v0, v1, n_local)
        scores = _assignment_scores(p, f"log_assignment.{n_layers - 1}",
                                    d0, d1, v0, v1)
        m0 = jnp.argmax(scores, axis=1)
        m1 = jnp.argmax(scores, axis=0)
        kk = scores.shape[0]
        mutual0 = m1[m0] == jnp.arange(kk)
        max0 = jnp.take_along_axis(scores, m0[:, None], axis=1)[:, 0]
        mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
        ok = mutual0 & (mscores0 > filter_threshold) & v0 & v1[m0]
        return jnp.where(ok, m0, -1), mscores0, ok

    in_specs = ({k: shard_axes[k] for k in sharded_params},
                P(), P(), P(), P(), P(), P())
    try:
        mapped = shard_map(fwd, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(), P(), P()), check_vma=False)
    except TypeError:  # older jax: check_rep instead of check_vma
        mapped = shard_map(fwd, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(), P(), P()), check_rep=False)
    return jax.jit(mapped)(sharded_params, kpts0_px, valid0, desc0,
                           kpts1_px, valid1, desc1)
