"""Cumulative-prefix profiling of the fused sparse bench step at B=192.

Standalone per-stage jits mislead through the axon tunnel (input layouts
from a producing jit change the consumer's cost; see PERF.md round-2b).
Ground truth = marginal cost of each stage INSIDE the single fused program:
time cumulative prefixes fwd -> +detect -> +sample -> +match and diff.

Run: timeout 580 python tools/profile_r6.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models.alike_s2d import alike_s2d_feats
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.ops.matching import mutual_nn_match, take_rows
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


def p_fwd(ims):
    s, f = jax.vmap(lambda im: alike_s2d_feats(params, im[None]))(ims)
    return s, f


def p_det(ims):
    s, f = p_fwd(ims)
    k, vv = detection_batch(s[:, 0, :, :, 0], dp)
    return k, vv, f


def p_samp(ims):
    k, vv, f = p_det(ims)
    d = sample(*[x[:, 0] for x in f], k)
    return k, vv, d


def p_full(ims):
    k, vv, d = p_samp(ims)
    nn01, ok = jax.vmap(lambda a, b, va, vb: mutual_nn_match(
        a, b, va, vb, 5.0))(d[:half], d[half:], vv[:half], vv[half:])
    return jnp.sum(ok), k[:half], jax.vmap(take_rows)(k[half:], nn01)


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


t1 = timeit("fwd          ", p_fwd)
t2 = timeit("fwd+det      ", p_det)
t3 = timeit("fwd+det+samp ", p_samp)
t4 = timeit("full         ", p_full)
print(f"marginal: det {(t2 - t1) / BATCH * 1e6:.1f} us/map, "
      f"samp {(t3 - t2) / BATCH * 1e6:.1f} us/map, "
      f"match {(t4 - t3) / BATCH * 1e6:.1f} us/map")
print(f"fps: {BATCH / t4:.1f}")
