"""Round-2 profiling: dense vs sparse-descriptor pipeline on the real TPU.

One process, several jits (claim+compile overhead amortized; CLAUDE.md).
Run: timeout 580 python tools/profile_r3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.alike_s2d import alike_s2d_feats
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops.detect import DetectParams, detection
from keypoint_bench_tpu.ops.matching import brute_force_match, mutual_nn_match
from keypoint_bench_tpu.ops.sparse_desc import alike_sparse_descriptors
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import _texture

SIZE = 512
BATCH = int(os.environ.get("B", "96"))
params = cast_params_bf16(load_params("Alike_s2d"))
model_fn = get_model("Alike_s2d")
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

rng = np.random.default_rng(0)
imgs0 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                              for _ in range(BATCH)]))
imgs1 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                              for _ in range(BATCH)]))


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    t_c = time.perf_counter()
    jax.block_until_ready(f(*args))
    print(f"{name}: compile {time.perf_counter() - t_c:.1f}s", flush=True)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms  ({2 * BATCH / dt:.1f} pair-fps)",
          flush=True)
    return dt


def pair_dense(img0, img1):
    s0, d0 = model_fn(params, img0[None])
    s1, d1 = model_fn(params, img1[None])
    k0, v0 = detection(s0[0], dp)
    k1, v1 = detection(s1[0], dp)
    m0, m1, ok = brute_force_match(k0, v0, k1, v1, d0[0], d1[0], 5.0)
    return jnp.sum(ok), k0, m1


def pair_sparse(img0, img1):
    s0, f0 = alike_s2d_feats(params, img0[None])
    s1, f1 = alike_s2d_feats(params, img1[None])
    k0, v0 = detection(s0[0], dp)
    k1, v1 = detection(s1[0], dp)
    d0 = alike_sparse_descriptors(params, [f[0] for f in f0], k0, SIZE, SIZE)
    d1 = alike_sparse_descriptors(params, [f[0] for f in f1], k1, SIZE, SIZE)
    nn01, ok = mutual_nn_match(d0, d1, v0, v1, 5.0)
    return jnp.sum(ok), k0, k1[nn01]


def fwd_detect_sparse(img0, img1):
    s0, f0 = alike_s2d_feats(params, img0[None])
    s1, f1 = alike_s2d_feats(params, img1[None])
    k0, v0 = detection(s0[0], dp)
    k1, v1 = detection(s1[0], dp)
    return k0, v0, k1, v1, f0[0], f1[0]


def fwd_only_sparse(img0, img1):
    s0, f0 = alike_s2d_feats(params, img0[None])
    s1, f1 = alike_s2d_feats(params, img1[None])
    return s0, s1, f0[0], f1[0]


t_dense = timeit("dense  pair_step", jax.vmap(pair_dense), imgs0, imgs1)
t_sparse = timeit("sparse pair_step", jax.vmap(pair_sparse), imgs0, imgs1)
t_fd = timeit("sparse fwd+detect", jax.vmap(fwd_detect_sparse), imgs0, imgs1)
t_f = timeit("sparse fwd only  ", jax.vmap(fwd_only_sparse), imgs0, imgs1)

print(f"\nper-image (batch {BATCH}, x2 imgs/pair):")
print(f"  forward          {t_f / BATCH / 2 * 1e3:.3f} ms")
print(f"  detection        {(t_fd - t_f) / BATCH / 2 * 1e3:.3f} ms")
print(f"  sample+match     {(t_sparse - t_fd) / BATCH / 2 * 1e3:.3f} ms")
print(f"  dense total      {t_dense / BATCH / 2 * 1e3:.3f} ms")
print(f"  sparse total     {t_sparse / BATCH / 2 * 1e3:.3f} ms")
