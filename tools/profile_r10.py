"""Round-3 profile: stage marginals of the cm pipeline vs the mm pipeline.

Scalarized cumulative prefixes (fwd / +det / +sample / full) for both
pipelines in one process — locate where the fused sampler's expected win
went (forward regression? kernel cost? tap-matrix build?).
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


def scalarize(t):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(t))


def make_prefixes(cm: bool):
    fwd = alike_s2d_feats_cm if cm else alike_s2d_feats

    def p_fwd(imgs0, imgs1):
        s0, f0 = fwd(params, imgs0)
        s1, f1 = fwd(params, imgs1)
        return s0, f0, s1, f1

    def p_det(imgs0, imgs1):
        s0, f0, s1, f1 = p_fwd(imgs0, imgs1)
        k0, v0 = detection_batch(s0[..., 0], dp)
        k1, v1 = detection_batch(s1[..., 0], dp)
        return f0, f1, k0, v0, k1, v1

    def samp(fs, k):
        if cm:
            return sd.alike_sparse_descriptors_cm_batch(
                params, tuple(fs), k, SIZE, SIZE)
        return jax.vmap(
            lambda a, b, c, d, kk: sd.alike_sparse_descriptors(
                params, (a, b, c, d), kk, SIZE, SIZE))(*fs, k)

    def p_samp(imgs0, imgs1):
        f0, f1, k0, v0, k1, v1 = p_det(imgs0, imgs1)
        return k0, v0, k1, v1, samp(f0, k0), samp(f1, k1)

    def full(imgs0, imgs1):
        k0, v0, k1, v1, d0, d1 = p_samp(imgs0, imgs1)
        d0m, d1m = d0.astype(jnp.bfloat16), d1.astype(jnp.bfloat16)
        nn01, ok = jax.vmap(
            lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0))(
            d0m, d1m, v0, v1)
        m1 = jax.vmap(take_rows)(k1, nn01)
        return jnp.sum(ok), k0, m1

    return [("fwd", p_fwd), ("det", p_det), ("samp", p_samp),
            ("full", full)]


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
    imgs0 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                  for _ in range(BATCH)]))
    imgs1 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                  for _ in range(BATCH)]))
    n_maps = 2.0 * BATCH

    import os as _os
    from keypoint_bench_tpu.models.alike_s2d import set_cm_branch_impl
    set_cm_branch_impl(_os.environ.get("R10_CM_IMPL", "permute"))
    sel = _os.environ.get("R10_PIPELINES", "01")
    for cm in [c == "1" for c in sel]:
        name = "cm" if cm else "mm"
        prev = 0.0
        line = []
        for pname, pfn in make_prefixes(cm):
            f = jax.jit(lambda a, b, p=pfn: scalarize(p(a, b)))
            t = timeit(f, imgs0, imgs1)
            line.append(f"{pname} +{(t - prev) / n_maps * 1e6:6.1f}")
            prev = t
        print(f"{name}: " + "  ".join(line) +
              f"   total {prev * 1e3:7.2f} ms  {n_maps / prev:7.1f} fps")


if __name__ == "__main__":
    main()
