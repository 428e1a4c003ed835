"""Round-3 profile: fused Pallas sampler (cm pipeline) vs the mm sampler.

One process, one TPU claim: compile both full bench steps (old =
alike_s2d_feats + XLA mm sampling; new = alike_s2d_feats_cm +
ops/pallas_sample fused kernel), check match agreement, time both.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models.alike_s2d import (alike_s2d_feats,
                                                 alike_s2d_feats_cm)
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.ops.matching import mutual_nn_match, take_rows
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.weights import load_params

BATCH = 96
SIZE = 512
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)
params = cast_params_bf16(load_params("Alike_s2d"))


def make_step(cm: bool):
    def batch_step(imgs0, imgs1):
        fwd = alike_s2d_feats_cm if cm else alike_s2d_feats
        s0, f0 = jax.vmap(lambda im: fwd(params, im[None]))(imgs0)
        s1, f1 = jax.vmap(lambda im: fwd(params, im[None]))(imgs1)
        k0, v0 = detection_batch(s0[:, 0, :, :, 0], dp)
        k1, v1 = detection_batch(s1[:, 0, :, :, 0], dp)
        if cm:
            def samp(*args):
                *fs, k = args
                return sd.alike_sparse_descriptors_cm_batch(
                    params, tuple(fs), k, SIZE, SIZE)
        else:
            samp = jax.vmap(
                lambda a, b, c, d, k: sd.alike_sparse_descriptors(
                    params, (a, b, c, d), k, SIZE, SIZE))
        d0 = samp(*[x[:, 0] for x in f0], k0)
        d1 = samp(*[x[:, 0] for x in f1], k1)
        d0m, d1m = d0.astype(jnp.bfloat16), d1.astype(jnp.bfloat16)
        nn01, ok = jax.vmap(
            lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0))(
            d0m, d1m, v0, v1)
        m1 = jax.vmap(take_rows)(k1, nn01)
        return jnp.sum(ok), k0, m1
    return jax.jit(batch_step)


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters, o


def main():
    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    imgs0 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                  for _ in range(BATCH)]))
    imgs1 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                  for _ in range(BATCH)]))

    step_old = make_step(False)
    step_new = make_step(True)
    t_old, o_old = timeit(step_old, imgs0, imgs1)
    t_new, o_new = timeit(step_new, imgs0, imgs1)
    n_old, n_new = int(o_old[0]), int(o_new[0])
    print(f"old mm pipeline : {t_old*1e3:8.2f} ms  "
          f"{2*BATCH/t_old:7.1f} fps  matches={n_old}")
    print(f"new cm pipeline : {t_new*1e3:8.2f} ms  "
          f"{2*BATCH/t_new:7.1f} fps  matches={n_new}")
    print(f"match agreement: {n_new}/{n_old}")


if __name__ == "__main__":
    main()
