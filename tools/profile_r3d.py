"""Round-2 profiling part 4: [H,W,B]-layout batched NMS + staged pipeline.

Run: timeout 580 python tools/profile_r3d.py
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
from keypoint_bench_tpu.ops.detect import (DetectParams, detection,
                                           detection_batch, fast_nms,
                                           fast_nms_batched)
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
scores = scores[:, 0, :, :, 0]


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


timeit("nms vmap   bf16", jax.vmap(lambda s: fast_nms(s, 6, 30)), scores)
timeit("nms batched bf16", lambda s: fast_nms_batched(s, 6, 30), scores)
timeit("detection_batch", lambda s: detection_batch(s, dp), scores)
timeit("detection vmap", jax.vmap(lambda s: detection(s, dp)), scores)

half = BATCH // 2


def staged_step(imgs0, imgs1):
    imgs = jnp.concatenate([imgs0, imgs1])
    s, f = jax.vmap(lambda im: alike_s2d_feats(params, im[None]))(imgs)
    kpts, valid = detection_batch(s[:, 0, :, :, 0], dp)
    desc = jax.vmap(
        lambda f1, f2, f3, f4, k: sd.alike_sparse_descriptors(
            params, (f1, f2, f3, f4), k, SIZE, SIZE)
    )(*[x[:, 0] for x in f], kpts)
    nn01, ok = jax.vmap(lambda a, b, va, vb: mutual_nn_match(a, b, va, vb,
                                                             5.0))(
        desc[:half], desc[half:], valid[:half], valid[half:])
    return jnp.sum(ok), kpts[:half], jnp.take_along_axis(
        kpts[half:], nn01[..., None], axis=1)


t = timeit("staged sparse step", staged_step, imgs[:half], imgs[half:])
print(f"pair-fps: {2 * half / t:.1f}")
