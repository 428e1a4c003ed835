"""Ring attention over the 'data' mesh axis — the sequence/context-parallel
primitive (SURVEY.md §2.7 SP/CP row, §5.7: ring/blockwise attention over
keypoint-set tokens for huge N).

Queries stay resident per shard; key/value chunks rotate around the ring with
`jax.lax.ppermute`, and softmax is accumulated online (flash-attention style
running max / normalizer), so a K-token attention runs with K/n_shards
resident memory per device and n-1 ICI hops.

LightGlue at its benchmark sizes (K <= 2k) does not need this — it exists as
the scaling path for very large keypoint sets and as the framework's CP
building block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

_AXIS = "data"
_NEG = -1e30


def _ring_attention_shard(q, k, v, kv_valid):
    """Per-shard body: q [h, nq, d]; k/v [h, nk, d]; kv_valid [nk].
    Online-softmax accumulation over ring-rotated kv chunks."""
    n_shards = jax.lax.psum(1, _AXIS)
    scale = q.shape[-1] ** -0.5

    def step(carry, _):
        k_c, v_c, m_c, acc, denom, run_max = carry
        sim = jnp.einsum("hid,hjd->hij", q, k_c) * scale
        sim = jnp.where(m_c[None, None, :], sim, _NEG)
        chunk_max = jnp.max(sim, axis=-1)                  # [h, nq]
        new_max = jnp.maximum(run_max, chunk_max)
        correction = jnp.exp(run_max - new_max)
        p = jnp.exp(sim - new_max[..., None])              # [h, nq, nk]
        acc = acc * correction[..., None] + jnp.einsum("hij,hjd->hid", p, v_c)
        denom = denom * correction + jnp.sum(p, axis=-1)
        # rotate kv to the next device on the ring
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k_n = jax.lax.ppermute(k_c, _AXIS, perm)
        v_n = jax.lax.ppermute(v_c, _AXIS, perm)
        m_n = jax.lax.ppermute(m_c, _AXIS, perm)
        return (k_n, v_n, m_n, acc, denom, new_max), None

    h, nq, d = q.shape
    def varying(x):
        # accumulators are per-shard state: mark them varying over the ring
        # axis so scan's carry typing accepts them (shard_map VMA rules)
        return jax.lax.pcast(x, (_AXIS,), to="varying")

    init = (k, v, kv_valid,
            varying(jnp.zeros((h, nq, d), jnp.float32)),
            varying(jnp.zeros((h, nq), jnp.float32)),
            varying(jnp.full((h, nq), _NEG, jnp.float32)))
    (k, v, m, acc, denom, _), _ = jax.lax.scan(step, init, None,
                                               length=n_shards)
    return acc / jnp.maximum(denom, 1e-30)[..., None]


def ring_attention(mesh, q, k, v, kv_valid):
    """Sequence-parallel attention: q [h, NQ, d] sharded on NQ, k/v [h, NK, d]
    sharded on NK over mesh axis 'data'; kv_valid [NK]. Returns [h, NQ, d]
    (sharded like q). Equals dense masked softmax attention."""
    fn = shard_map(
        _ring_attention_shard, mesh=mesh,
        in_specs=(P(None, _AXIS, None), P(None, _AXIS, None),
                  P(None, _AXIS, None), P(_AXIS)),
        out_specs=P(None, _AXIS, None))
    return jax.jit(fn)(q, k, v, kv_valid)


def dense_attention(q, k, v, kv_valid):
    """Reference dense computation for validation."""
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("hid,hjd->hij", q, k) * scale
    sim = jnp.where(kv_valid[None, None, :], sim, _NEG)
    return jnp.einsum("hij,hjd->hid", jax.nn.softmax(sim, axis=-1), v)
