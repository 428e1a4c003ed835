"""Round-2b profiling: current stage budget of the sparse bench pipeline.

Measures, at the bench batch size on textured inputs:
  - forward (alike_s2d_feats)
  - NMS alone (pallas vmap)
  - border + top-k alone (extraction path), and whether the exact-top-k
    fallback sort triggers on textured NMS'd maps (the `unsafe` predicate)
  - sparse descriptor sampling (mm impl, bf16)
  - mutual-NN matching
  - the full fused bench step (for the fps anchor)

Run: timeout 580 python tools/profile_r4.py
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
from keypoint_bench_tpu.ops import detect as D
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.ops.matching import mutual_nn_match
from keypoint_bench_tpu.ops.pallas_nms import fast_nms_pallas
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
scores = scores[:, 0, :, :, 0]


def timeit(name, fn, *args, iters=20):
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


t_fwd = timeit("fwd", lambda im: fwd(im), imgs)

nms_fn = jax.vmap(lambda s: fast_nms_pallas(
    s.astype(jnp.float32), 6, 30).astype(s.dtype))
nmsd = jax.block_until_ready(jax.jit(nms_fn)(scores))
t_nms = timeit("nms pallas vmap", nms_fn, scores)


def border_topk(nms):
    b = nms.shape[0]
    nmsb = jax.vmap(lambda m: D.remove_border(m, dp.border_dist))(nms)
    flats = nmsb.reshape(b, SIZE * SIZE)
    v, i, unsafe = jax.vmap(lambda f: D._topk_candidates(f, dp.top_k))(flats)
    return v, i, unsafe


t_topk = timeit("border+topk extract", border_topk, nmsd)
v, i, unsafe = jax.jit(border_topk)(nmsd)
print("unsafe maps (fallback sort would run):",
      int(jnp.sum(unsafe)), "/", BATCH)


def topk_sort(nms):
    b = nms.shape[0]
    nmsb = jax.vmap(lambda m: D.remove_border(m, dp.border_dist))(nms)
    flats = nmsb.reshape(b, SIZE * SIZE)
    return jax.vmap(lambda f: D._topk_stable_sort(f, dp.top_k))(flats)


t_sort = timeit("border+topk SORT", topk_sort, nmsd)

t_det = timeit("detection_batch", lambda s: detection_batch(s, dp), scores)
kpts, valid = jax.jit(lambda s: detection_batch(s, dp))(scores)

sample = jax.vmap(
    lambda f1, f2, f3, f4, k: sd.alike_sparse_descriptors(
        params, (f1, f2, f3, f4), k, SIZE, SIZE))
t_samp = timeit("sparse sampling", lambda f, k: sample(*[x[:, 0] for x in f],
                                                       k), feats, kpts)
desc = jax.jit(lambda f, k: sample(*[x[:, 0] for x in f], k))(feats, kpts)

half = BATCH // 2
t_match = timeit(
    "match", lambda d, vv: jax.vmap(
        lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0))(
        d[:half], d[half:], vv[:half], vv[half:]), desc, valid)


def full_step(imgs0, imgs1):
    ims = jnp.concatenate([imgs0, imgs1])
    s, f = jax.vmap(lambda im: alike_s2d_feats(params, im[None]))(ims)
    k, vv = detection_batch(s[:, 0, :, :, 0], dp)
    d = sample(*[x[:, 0] for x in f], k)
    nn01, ok = jax.vmap(lambda a, b, va, vb: mutual_nn_match(
        a, b, va, vb, 5.0))(d[:half], d[half:], vv[:half], vv[half:])
    from keypoint_bench_tpu.ops.matching import take_rows
    return jnp.sum(ok), k[:half], jax.vmap(take_rows)(k[half:], nn01)


t_full = timeit("full step", full_step, imgs[:half], imgs[half:])
print(f"pair-fps: {2 * half / t_full:.1f}")
print(f"sum of stages: {(t_fwd + t_det + t_samp + t_match) * 1e3:.2f} ms "
      f"vs full {t_full * 1e3:.2f} ms")
