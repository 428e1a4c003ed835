"""Mosaic capability probe: constant-pattern lane gathers / strided slices.

The strip-fused stem megakernel (ROADMAP) lives or dies on one primitive:
rearranging image lanes (x*3+c interleave) into conv-patch operands without
MXU one-hot matmuls. This probes what Mosaic lowers and at what cost:
  A. baseline VMEM copy [512, 1536]
  B. constant-index lane gather x[:, idx] (stride 12)
  C. strided lane slice x[:, 0::12]
  D. reshape [512, 1536] -> [512, 128, 12] -> [..., 0]
  E. lane rotate + mask (known-supported reference point)
Each variant compiles standalone; failures print the Mosaic error.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 512, 1536
REP = 8  # gathers per kernel call (amortize dispatch)


def run(name, kernel, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((H, W)),
                        jnp.float32)
        g = jax.jit(f)
        jax.block_until_ready(g(x))
        t0 = time.perf_counter()
        for _ in range(50):
            o = g(x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: OK  {dt * 1e6:8.1f} us/call "
              f"({dt / REP * 1e6:6.1f} us/gather of {H}x{W//12} lanes)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAIL  {msg}")


def k_copy(x_ref, o_ref):
    acc = jnp.zeros((H, 128), jnp.float32)
    for i in range(REP):
        acc = acc + x_ref[:, i * 128:(i + 1) * 128]
    o_ref[...] = acc


def k_take(x_ref, o_ref):
    acc = jnp.zeros((H, 128), jnp.float32)
    for i in range(REP):
        idx = jnp.arange(i, W, 12)[:128]
        acc = acc + jnp.take(x_ref[...], idx, axis=1)
    o_ref[...] = acc


def k_stride(x_ref, o_ref):
    acc = jnp.zeros((H, 128), jnp.float32)
    for i in range(REP):
        acc = acc + x_ref[...][:, i::12][:, :128]
    o_ref[...] = acc


def k_reshape(x_ref, o_ref):
    acc = jnp.zeros((H, 128), jnp.float32)
    v = x_ref[...].reshape(H, 128, 12)
    for i in range(REP):
        acc = acc + v[:, :, i % 12]
    o_ref[...] = acc


def k_roll(x_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu
    acc = jnp.zeros((H, 128), jnp.float32)
    for i in range(REP):
        acc = acc + pltpu.roll(x_ref[...], i, 1)[:, :128]
    o_ref[...] = acc


def main():
    run("A copy-slices ", k_copy, (H, 128))
    run("B take-const  ", k_take, (H, 128))
    run("C strided-slice", k_stride, (H, 128))
    run("D reshape-pick", k_reshape, (H, 128))
    run("E lane-roll   ", k_roll, (H, 128))


if __name__ == "__main__":
    main()
