"""Round-5 probe: per-point 22x22 window extraction from a VMEM-resident
band via 8-aligned dynamic sublane slab + two dynamic pltpu.rolls — the
primitive the sorted-band Pallas LK kernel lives or dies on.

Measures: 128 points x 9 channels per kernel call, one [32, 640] slab
slice + 3D roll pair per point, summed into an accumulator (prevents DCE).
Compares against the value of the reference XLA slice for correctness.
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

C, HB, WB = 9, 192, 640
NPTS = 128
WSZ = 22


def kernel(q_ref, ry_ref, x0_ref, band_hbm, out_ref, band_ref, sem):
    cp = pltpu.make_async_copy(band_hbm, band_ref, sem)
    cp.start()
    cp.wait()

    def body(k, acc):
        q = q_ref[k]
        ry = ry_ref[k]
        xq = x0_ref[k] // 128
        rx = x0_ref[k] - xq * 128
        slab = band_ref[:, pl.ds(q * 8, 32),
                        pl.ds(xq * 128, 256)]            # [C, 32, 256]
        r = pltpu.roll(slab, 32 - ry, axis=1)
        r = pltpu.roll(r, 256 - rx, axis=2)
        # rolled so the window starts at sublane (32-ry+...)? take rows
        # [32-? ...] -- for the probe, just take the first 22 rows / 128
        # lanes after rolling window start to position 0
        win = r[:, 0:WSZ, 0:128]
        return acc + jnp.sum(win[:, :, 0:WSZ], dtype=jnp.float32)

    out_ref[0, 0] = lax.fori_loop(0, NPTS, body, 0.0)


def main():
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.standard_normal((C, HB, WB)), jnp.float32)
    y0 = rng.integers(0, HB - 40, NPTS).astype(np.int32)
    x0 = rng.integers(0, WB - 300, NPTS).astype(np.int32)
    q = jnp.asarray(y0 // 8)
    ry = jnp.asarray(y0 % 8)
    x0j = jnp.asarray(x0)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, HB, WB), jnp.float32),
                        pltpu.SemaphoreType.DMA])

    try:
        g = jax.jit(f)
        r = g(q, ry, x0j, band)
        jax.block_until_ready(r)
    except Exception as e:
        print("FAIL:", str(e).split(chr(10))[0][:300])
        return

    # correctness vs XLA: sum over the same windows
    ref = 0.0
    bandn = np.asarray(band)
    for k in range(NPTS):
        yy = (y0[k] // 8) * 8 + (32 - (y0[k] % 8)) % 32
        # roll semantics: roll(x, s) moves element i to i+s; window start
        # ends up where? probe checks only that it RUNS + timing; value
        # check below is vs the same roll math in numpy
        xq = x0[k] // 128
        slab = bandn[:, (y0[k] // 8) * 8:(y0[k] // 8) * 8 + 32,
                     xq * 128:xq * 128 + 256]
        r1 = np.roll(slab, 32 - (y0[k] % 8), axis=1)
        r2 = np.roll(r1, 256 - (x0[k] - xq * 128), axis=2)
        ref += r2[:, 0:WSZ, 0:WSZ].sum()
    got = float(np.asarray(r)[0, 0])
    print(f"value: got {got:.3f} ref {ref:.3f} "
          f"({'OK' if abs(got - ref) < abs(ref) * 1e-5 + 1e-2 else 'MISMATCH'})")

    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        o = g(q, ry, x0j, band)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"extract 128 pts x 9ch [32,256] slab+2 rolls: {dt * 1e6:8.1f} "
          f"us/call = {dt / NPTS * 1e9:6.1f} ns/pt")


if __name__ == "__main__":
    main()
