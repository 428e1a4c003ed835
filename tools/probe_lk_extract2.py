"""Round-5 probe 2: isolate the per-point cost in the roll-extraction loop:
  A. dynamic slab slice only (sum, no roll)
  B. slab + 2 STATIC rolls
  C. slab + 2 dynamic rolls (the full primitive)
  D. C but 1 channel
  E. static slab (no dynamic slice) + 2 dynamic rolls
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB, WB = 192, 640
NPTS = 128


def make(variant, C):
    def kernel(q_ref, ry_ref, x0_ref, band_hbm, out_ref, band_ref, sem):
        cp = pltpu.make_async_copy(band_hbm, band_ref, sem)
        cp.start()
        cp.wait()

        def body(k, acc):
            q = q_ref[k]
            ry = ry_ref[k]
            xq = x0_ref[k] // 128
            rx = x0_ref[k] - xq * 128
            if variant == "E":
                slab = band_ref[:, 0:32, 0:256]
            else:
                slab = band_ref[:, pl.ds(q * 8, 32), pl.ds(xq * 128, 256)]
            if variant == "A":
                r = slab
            elif variant == "B":
                r = pltpu.roll(slab, 7, axis=1)
                r = pltpu.roll(r, 100, axis=2)
            else:
                r = pltpu.roll(slab, 32 - ry, axis=1)
                r = pltpu.roll(r, 256 - rx, axis=2)
            return acc + jnp.sum(r[:, 0:22, 0:128], dtype=jnp.float32)

        out_ref[0, 0] = lax.fori_loop(0, NPTS, body, 0.0)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, HB, WB), jnp.float32),
                        pltpu.SemaphoreType.DMA])


def main():
    rng = np.random.default_rng(0)
    for variant in "ABCDE":
        C = 1 if variant == "D" else 9
        band = jnp.asarray(rng.standard_normal((C, HB, WB)), jnp.float32)
        y0 = rng.integers(0, HB - 40, NPTS).astype(np.int32)
        x0 = rng.integers(0, WB - 300, NPTS).astype(np.int32)
        q = jnp.asarray(y0 // 8)
        ry = jnp.asarray(y0 % 8)
        x0j = jnp.asarray(x0)
        try:
            g = jax.jit(make(variant, C))
            jax.block_until_ready(g(q, ry, x0j, band))
        except Exception as e:
            print(f"{variant}: FAIL {str(e).split(chr(10))[0][:160]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(50):
            o = g(q, ry, x0j, band)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 50
        print(f"{variant} (C={C}): {dt * 1e6:8.1f} us/call = "
              f"{dt / NPTS * 1e9:7.1f} ns/pt", flush=True)


if __name__ == "__main__":
    main()
