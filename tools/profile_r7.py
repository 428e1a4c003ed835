"""Bisect the in-graph matcher cost: fused full-step variants at B=192.

Run: timeout 580 python tools/profile_r7.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keypoint_bench_tpu.models.alike_s2d import alike_s2d_feats
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.ops.matching import (mutual_nn_match, pairwise_sqdist,
                                             take_rows)
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import _texture

SIZE = 512
BATCH = int(os.environ.get("B", "192"))
half = BATCH // 2
params = cast_params_bf16(load_params("Alike_s2d"))
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                             for _ in range(BATCH)]))

sample = jax.vmap(
    lambda f1, f2, f3, f4, k: sd.alike_sparse_descriptors(
        params, (f1, f2, f3, f4), k, SIZE, SIZE))


def prefix(ims):
    s, f = jax.vmap(lambda im: alike_s2d_feats(params, im[None]))(ims)
    k, vv = detection_batch(s[:, 0, :, :, 0], dp)
    d = sample(*[x[:, 0] for x in f], k)
    return k, vv, d


def timeit(name, fn, iters=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(imgs))
    jax.block_until_ready(f(imgs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(imgs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms total, {dt / BATCH * 1e6:.1f} us/map",
          flush=True)
    return dt


t0 = timeit("prefix (no match)   ", prefix)


def with_match(match_fn):
    def step(ims):
        k, vv, d = prefix(ims)
        nn01, ok = jax.vmap(match_fn)(d[:half], d[half:], vv[:half],
                                      vv[half:])
        return jnp.sum(ok), k[:half], jax.vmap(take_rows)(k[half:], nn01)
    return step


timeit("match current f32    ", with_match(
    lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0)))


def match_bf16(a, b, va, vb):
    return mutual_nn_match(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           va, vb, 5.0)


timeit("match bf16 desc      ", with_match(match_bf16))


def match_fwd_only(a, b, va, vb):
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(va[:, None] & vb[None, :], d2, 1e30)
    nn01 = jnp.argmin(d2, axis=1)
    best = jnp.min(d2, axis=1)
    ok = va & (best < 25.0) & (best < 1e30)
    return nn01, ok


timeit("match fwd-NN only    ", with_match(match_fwd_only))


def match_dist_only(a, b, va, vb):
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(va[:, None] & vb[None, :], d2, 1e30)
    best = jnp.min(d2, axis=1)
    return jnp.argmax(best).astype(jnp.int32) * jnp.zeros((a.shape[0],),
                                                          jnp.int32), \
        va & (best < 25.0)


timeit("match dist+rowmin    ", with_match(match_dist_only))


def match_colmin_too(a, b, va, vb):
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(va[:, None] & vb[None, :], d2, 1e30)
    best = jnp.min(d2, axis=1)
    cbest = jnp.min(d2, axis=0)
    ok = va & (best < 25.0) & (cbest < 1e30)
    return jnp.zeros((a.shape[0],), jnp.int32), ok


timeit("match dist+row+colmin", with_match(match_colmin_too))


def match_argmin0(a, b, va, vb):
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(va[:, None] & vb[None, :], d2, 1e30)
    nn10 = jnp.argmin(d2, axis=0)
    return nn10, va & (nn10 >= 0)


timeit("match argmin ax0 only", with_match(match_argmin0))
