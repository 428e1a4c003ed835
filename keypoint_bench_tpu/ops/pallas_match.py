"""Pallas TPU kernel: fused brute-force mutual-NN matching.

The jnp path (ops/matching.py) materializes the [K, K] squared-distance
matrix in HBM and re-reads it for two argmins. This kernel tiles the distance
computation on the MXU and keeps running row/col minima in VMEM, so the K^2
matrix never leaves the chip: one pass, 4 small [K,1] outputs.

Validity masking is folded into the descriptors before the kernel: an
appended penalty feature adds a huge constant to every distance involving an
invalid row, which removes it from every argmin without branching.

Measured on TPU v5e at K=1024, D=64: 999us vs 719us for the jnp path — XLA
already fuses the distance matmul + argmins well at benchmark sizes, so the
jnp path stays the default; this kernel is the scaling path for K >= 4k
where the K^2 HBM round-trip starts to dominate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PEN = 1e8  # penalty added (via sqrt feature) per invalid endpoint


def _kernel(a_ref, b_ref, nn01_ref, d01_ref, nn10_ref, d10_ref, *, tm, tn):
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[:]
    b = b_ref[:]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    s = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)

    rmin = jnp.min(s, axis=1, keepdims=True)
    ridx = jnp.argmin(s, axis=1)[:, None].astype(jnp.int32) + j * tn

    @pl.when(j == 0)
    def _():
        d01_ref[:] = jnp.full_like(d01_ref, jnp.inf)
        nn01_ref[:] = jnp.zeros_like(nn01_ref)

    upd_r = rmin < d01_ref[:]
    nn01_ref[:] = jnp.where(upd_r, ridx, nn01_ref[:])
    d01_ref[:] = jnp.where(upd_r, rmin, d01_ref[:])

    cmin = jnp.min(s, axis=0)[:, None]
    cidx = jnp.argmin(s, axis=0)[:, None].astype(jnp.int32) + i * tm

    @pl.when(i == 0)
    def _():
        d10_ref[:] = jnp.full_like(d10_ref, jnp.inf)
        nn10_ref[:] = jnp.zeros_like(nn10_ref)

    upd_c = cmin < d10_ref[:]
    nn10_ref[:] = jnp.where(upd_c, cidx, nn10_ref[:])
    d10_ref[:] = jnp.where(upd_c, cmin, d10_ref[:])


def _pad_rows(x, m):
    pad = (-x.shape[0]) % m
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_nn_dists(desc0, desc1, tile: int = 256, interpret: bool = False):
    """Row/col nearest neighbours of the squared-distance matrix.
    desc [K, D] f32 -> (nn01 [M], d01 [M], nn10 [N], d10 [N])."""
    m0, n0 = desc0.shape[0], desc1.shape[0]
    dpad = (-desc0.shape[1]) % 128
    a = jnp.pad(desc0.astype(jnp.float32), ((0, 0), (0, dpad)))
    b = jnp.pad(desc1.astype(jnp.float32), ((0, 0), (0, dpad)))
    a = _pad_rows(a, tile)
    b = _pad_rows(b, tile)
    m, n = a.shape[0], b.shape[0]
    d = a.shape[1]

    grid = (m // tile, n // tile)
    out_shape = (
        jax.ShapeDtypeStruct((m, 1), jnp.int32),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
    )
    nn01, d01, nn10, d10 = pl.pallas_call(
        functools.partial(_kernel, tm=tile, tn=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(a, b)
    return (nn01[:m0, 0], d01[:m0, 0], nn10[:n0, 0], d10[:n0, 0])


def pallas_mutual_nn(desc0, desc1, valid0, valid1,
                     max_distance: float = jnp.inf, tile: int = 256,
                     interpret: bool = False):
    """Drop-in for ops.matching.mutual_nn_match built on the fused kernel."""
    pen0 = jnp.where(valid0, 0.0, _PEN)[:, None]
    pen1 = jnp.where(valid1, 0.0, _PEN)[:, None]
    a = jnp.concatenate([desc0.astype(jnp.float32), jnp.sqrt(pen0)], axis=1)
    b = jnp.concatenate([desc1.astype(jnp.float32), jnp.sqrt(pen1)], axis=1)
    nn01, d01, nn10, _ = pallas_nn_dists(a, b, tile=tile, interpret=interpret)
    mutual = nn10[nn01] == jnp.arange(desc0.shape[0])
    true_d = d01 - pen0[:, 0] - pen1[nn01, 0]
    ok = (mutual & valid0 & valid1[nn01]
          & (true_d < float(max_distance) ** 2))
    return nn01, ok
