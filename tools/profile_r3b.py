"""Round-2 profiling part 2: detection + sampling internals on textured maps.

One process, several jits. Run: timeout 580 python tools/profile_r3b.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.alike_s2d import alike_s2d_feats
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops.detect import (DetectParams, detection, fast_nms,
                                           _local_max_mask, remove_border)
from keypoint_bench_tpu.ops.matching import mutual_nn_match
from keypoint_bench_tpu.ops.sparse_desc import (alike_sparse_descriptors,
                                                sample_direct,
                                                sample_upsampled)
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import _texture

SIZE = 512
BATCH = int(os.environ.get("B", "192"))  # maps (= 2 x pair batch 96)
params = cast_params_bf16(load_params("Alike_s2d"))
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                             for _ in range(BATCH)]))

# score maps + branch feats once
fwd = jax.jit(jax.vmap(lambda im: alike_s2d_feats(params, im[None])))
(scores, feats) = jax.block_until_ready(fwd(imgs))
scores = scores[:, 0, :, :, 0]
feats = [f[:, 0] for f in feats]
print("scores", scores.shape, scores.dtype, flush=True)


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


# how many fixpoint iterations do textured maps need?
def count_iters(p):
    def cond(st):
        _, _, c, pc, i = st
        return (c != pc) & (i < 30)

    def body(st):
        pmap, mask, c, _, i = st
        maskf = mask.astype(pmap.dtype)
        d = 6
        padded = jnp.pad(maskf, d, constant_values=0.0)
        from keypoint_bench_tpu.ops.detect import _box_sum
        others = _box_sum(padded, SIZE, SIZE, d) - maskf
        pmap = jnp.where(others > 0.0, 0.0, pmap)
        m2 = _local_max_mask(pmap, d)
        return pmap, m2, jnp.sum(m2.astype(jnp.int32)), c, i + 1

    m0 = _local_max_mask(p, 6)
    st = (p, m0, jnp.sum(m0.astype(jnp.int32)), jnp.int32(-1), jnp.int32(0))
    st = jax.lax.while_loop(cond, body, st)
    return st[4]

iters = jax.jit(jax.vmap(count_iters))(scores.astype(jnp.float32))
print("fixpoint iterations per map: min/mean/max =",
      int(jnp.min(iters)), float(jnp.mean(iters)), int(jnp.max(iters)),
      flush=True)

# stage costs
timeit("nms (full fixpoint)",
       jax.vmap(lambda s: fast_nms(s.astype(jnp.float32), 6, 30)), scores)
timeit("nms (max_iter=2)",
       jax.vmap(lambda s: fast_nms(s.astype(jnp.float32), 6, 2)), scores)
timeit("local_max_mask x1",
       jax.vmap(lambda s: _local_max_mask(s.astype(jnp.float32), 6)), scores)
timeit("detection (nms+border+topk)",
       jax.vmap(lambda s: detection(s, dp)), scores)

kpts, valid = jax.jit(jax.vmap(lambda s: detection(s, dp)))(scores)
kpts = jax.block_until_ready(kpts)

timeit("sample a1 (direct 2x2)",
       jax.vmap(lambda f, k: sample_direct(f, k[:, 0] * (SIZE - 1.0),
                                           k[:, 1] * (SIZE - 1.0))),
       feats[0], kpts)
timeit("sample a2 (up 4x4)",
       jax.vmap(lambda f, k: sample_upsampled(f, k[:, 0] * (SIZE - 1.0),
                                              k[:, 1] * (SIZE - 1.0),
                                              SIZE, SIZE)),
       feats[1], kpts)
timeit("sample a4 (up 4x4 small)",
       jax.vmap(lambda f, k: sample_upsampled(f, k[:, 0] * (SIZE - 1.0),
                                              k[:, 1] * (SIZE - 1.0),
                                              SIZE, SIZE)),
       feats[3], kpts)
timeit("sparse desc (all 4)",
       jax.vmap(lambda fs1, fs2, fs3, fs4, k: alike_sparse_descriptors(
           params, (fs1, fs2, fs3, fs4), k, SIZE, SIZE)),
       *feats, kpts)

desc = jax.jit(jax.vmap(lambda fs1, fs2, fs3, fs4, k:
                        alike_sparse_descriptors(
                            params, (fs1, fs2, fs3, fs4), k, SIZE, SIZE)))(
    *feats, kpts)
desc = jax.block_until_ready(desc)
h = BATCH // 2
timeit("mutual_nn match", jax.vmap(partial(mutual_nn_match, max_distance=5.0)),
       desc[:h], desc[h:], valid[:h], valid[h:], iters=10)
