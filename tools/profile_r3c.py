"""Round-2 profiling part 3: bf16 NMS + 3-pass mask, topk split, mm sampling.

Run: timeout 580 python tools/profile_r3c.py
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
from keypoint_bench_tpu.ops.detect import (DetectParams, detection, fast_nms,
                                           remove_border)
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.ops.matching import mutual_nn_match
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import _texture

SIZE = 512
BATCH = int(os.environ.get("B", "192"))
params = cast_params_bf16(load_params("Alike_s2d"))
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                             for _ in range(BATCH)]))
fwd = jax.jit(jax.vmap(lambda im: alike_s2d_feats(params, im[None])))
(scores, feats) = jax.block_until_ready(fwd(imgs))
scores = scores[:, 0, :, :, 0]          # bf16 [B, H, W]
feats = [f[:, 0] for f in feats]


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms total, {dt / BATCH * 1e6:.1f} us/map",
          flush=True)
    return dt


timeit("nms bf16 3-pass", jax.vmap(lambda s: fast_nms(s, 6, 30)), scores)
timeit("nms f32  3-pass",
       jax.vmap(lambda s: fast_nms(s.astype(jnp.float32), 6, 30)), scores)

nmsd = jax.jit(jax.vmap(lambda s: fast_nms(s, 6, 30)))(scores)
nmsd = jax.block_until_ready(nmsd)
timeit("border+topk (bf16 in)",
       jax.vmap(lambda n: lax.top_k(remove_border(n, 8).reshape(-1), 1000)),
       nmsd)
timeit("topk only (bf16)",
       jax.vmap(lambda n: lax.top_k(n.reshape(-1), 1000)), nmsd)
timeit("detection e2e", jax.vmap(lambda s: detection(s, dp)), scores)

kpts, valid = jax.jit(jax.vmap(lambda s: detection(s, dp)))(scores)
kpts = jax.block_until_ready(kpts)

for impl in ("gather", "mm"):
    sd.set_sample_impl(impl)
    timeit(f"sample a1 {impl}",
           jax.vmap(lambda f, k: sd.sample_direct(
               f, k[:, 0] * (SIZE - 1.0), k[:, 1] * (SIZE - 1.0))),
           feats[0], kpts)
    timeit(f"sample a2 {impl}",
           jax.vmap(lambda f, k: sd.sample_upsampled(
               f, k[:, 0] * (SIZE - 1.0), k[:, 1] * (SIZE - 1.0),
               SIZE, SIZE)), feats[1], kpts)
    timeit(f"sample a3 {impl}",
           jax.vmap(lambda f, k: sd.sample_upsampled(
               f, k[:, 0] * (SIZE - 1.0), k[:, 1] * (SIZE - 1.0),
               SIZE, SIZE)), feats[2], kpts)
    timeit(f"sparse desc all {impl}",
           jax.vmap(lambda f1, f2, f3, f4, k: sd.alike_sparse_descriptors(
               params, (f1, f2, f3, f4), k, SIZE, SIZE)), *feats, kpts)
sd.set_sample_impl("auto")


def pair_sparse(img0, img1):
    s0, f0 = alike_s2d_feats(params, img0[None])
    s1, f1 = alike_s2d_feats(params, img1[None])
    k0, v0 = detection(s0[0], dp)
    k1, v1 = detection(s1[0], dp)
    d0 = sd.alike_sparse_descriptors(params, [f[0] for f in f0], k0,
                                     SIZE, SIZE)
    d1 = sd.alike_sparse_descriptors(params, [f[0] for f in f1], k1,
                                     SIZE, SIZE)
    nn01, ok = mutual_nn_match(d0, d1, v0, v1, 5.0)
    return jnp.sum(ok), k0, k1[nn01]

half = BATCH // 2
t = timeit("sparse pair_step (auto impl)", jax.vmap(pair_sparse),
           imgs[:half], imgs[half:])
print(f"pair-fps: {2 * half / t:.1f}")
