"""Round-3: vmapped-batch-1 forward (bench style) vs native batched call.

The bench wraps the model as vmap(lambda im: fwd(params, im[None])) — a
leftover from the per-pair step. The model is natively batch-capable;
this measures whether the vmap wrapper costs anything end-to-end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models.alike_s2d import alike_s2d_feats_cm
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.weights import load_params

BATCH = 96
SIZE = 512
params = cast_params_bf16(load_params("Alike_s2d"))


def scalarize(t):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(t))


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                 for _ in range(BATCH)]))

    f_vmap = jax.jit(lambda im: scalarize(jax.vmap(
        lambda x: alike_s2d_feats_cm(params, x[None]))(im)))
    f_batched = jax.jit(lambda im: scalarize(alike_s2d_feats_cm(params, im)))
    t1 = timeit(f_vmap, imgs)
    t2 = timeit(f_batched, imgs)
    print(f"vmap-b1 fwd: {t1 / BATCH * 1e6:7.1f} us/map")
    print(f"batched fwd: {t2 / BATCH * 1e6:7.1f} us/map")


if __name__ == "__main__":
    main()
