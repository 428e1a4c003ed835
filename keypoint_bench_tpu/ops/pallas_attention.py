"""Pallas TPU kernel: fused masked attention for LightGlue.

The dense path (models/lightglue.py _attention/_cross_block) materializes the
[h, K0, K1] similarity/attention tensors in HBM; at the benchmark sizes
(K <= 2k) XLA fuses this well, but in the K >= 2k regime the K^2 HBM
round-trips dominate (SURVEY.md §2.6 names a fused attention kernel as the
reference's flash-attention equivalent, reference models/lightglue.py:126-150).

This kernel tiles queries over the grid and keeps the whole (small-dh)
key/value set VMEM-resident per head: each [block_q, K] score tile is
computed on the MXU, masked, softmaxed and contracted with V without ever
leaving the chip. No online-softmax accumulation is needed because a full
score row fits VMEM comfortably up to K ~ 8k; beyond that the ring-attention
path (parallel/ring_attention.py) shards the sequence over chips.

Masking matches the dense path bit-for-bit: invalid kv lanes are set to the
same -1e9 before the softmax, so an all-invalid row degrades to the same
uniform distribution (no NaNs), and valid rows agree with the dense result
to float32 rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, m_real):
    q = q_ref[0]                      # [bq, dh]
    k = k_ref[0]                      # [m, dh]
    v = v_ref[0]                      # [m, dh]
    msk = m_ref[:]                    # [1, m] int32
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = jnp.where(msk != 0, s, _NEG)  # [bq, m]
    # lane-padding columns must be strictly impossible (-inf), not just
    # masked at -1e9, or an all-invalid row would spread its uniform
    # fallback distribution over the phantom columns too
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < m_real, s, -jnp.inf)
    rmax = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - rmax)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "interpret"))
def fused_attention(q, k, v, kv_valid, *, scale: float | None = None,
                    block_q: int = 256, interpret: bool = False):
    """Masked softmax attention, fused on-chip.

    q [h, n, dh], k/v [h, m, dh], kv_valid [m] bool -> [h, n, dh] (f32).
    scale defaults to dh**-0.5; pass scale=1.0 when q/k are pre-scaled
    (the LightGlue cross block splits the scale across both sides).
    """
    h, n, dh = q.shape
    m = k.shape[1]
    if scale is None:
        scale = dh ** -0.5
    bq = min(block_q, max(128, 1 << (n - 1).bit_length()))
    # lane-align dh (zero feature-padding changes no dot product) and
    # block-align the query rows (padded rows are sliced off)
    dpad = (-dh) % 128
    npad = (-n) % bq
    mpad = (-m) % 128
    f32 = jnp.float32
    qp = jnp.pad(q.astype(f32), ((0, 0), (0, npad), (0, dpad)))
    kp = jnp.pad(k.astype(f32), ((0, 0), (0, mpad), (0, dpad)))
    vp = jnp.pad(v.astype(f32), ((0, 0), (0, mpad), (0, dpad)))
    msk = jnp.pad(kv_valid.astype(jnp.int32), (0, mpad))[None, :]
    np_, mp_, dp_ = n + npad, m + mpad, dh + dpad

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, m_real=m),
        grid=(h, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp_), lambda hi, qi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp_, dp_), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp_, dp_), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp_), lambda hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp_), lambda hi, qi: (hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, np_, dp_), f32),
        interpret=interpret,
    )(qp, kp, vp, msk)
    return out[:, :n, :dh]
