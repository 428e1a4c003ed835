"""Forward-internal prefix bisection + sampling second-contraction variant.

Run: timeout 580 python tools/profile_r8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.alike_s2d import (_branches, _combined_up,
                                                 alike_s2d_feats, un_s2d)
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops import sparse_desc as sd
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.weights import load_params
from keypoint_bench_tpu.datasets.synthetic import _texture

SIZE = 512
BATCH = int(os.environ.get("B", "96"))
params = cast_params_bf16(load_params("Alike_s2d"))
dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                             for _ in range(BATCH)]))


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


p = params
b = 4


def stem_only(ims):
    """_branches up to x1b (stem convs in block layout)."""
    cast = (lambda w: w.astype(jnp.bfloat16))
    w8 = cast(p["block1.conv1.weight_s2d8"])
    dn = jax.lax.conv_dimension_numbers(
        ims.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        ims.astype(w8.dtype), w8, (b, b), [(1, b - 1), (1, b - 1)],
        dimension_numbers=dn, precision=c._CONV_PRECISION[0],
        preferred_element_type=jnp.bfloat16)
    if "block1.conv1.bias_s2d" in p:
        y = y + p["block1.conv1.bias_s2d"]
    y = c.relu(c.bn_eval(y, p["block1.bn1.weight_s2d"],
                         p["block1.bn1.bias_s2d"],
                         p["block1.bn1.running_mean_s2d"],
                         p["block1.bn1.running_var_s2d"]))
    y = c.conv2d(y, cast(p["block1.conv2.weight_s2d"]),
                 p.get("block1.conv2.bias_s2d"), 1, 1)
    x1b = c.relu(c.bn_eval(y, p["block1.bn2.weight_s2d"],
                           p["block1.bn2.bias_s2d"],
                           p["block1.bn2.running_mean_s2d"],
                           p["block1.bn2.running_var_s2d"]))
    return x1b


def stem_a1(ims):
    x1b = stem_only(ims)
    cast = (lambda w: w.astype(jnp.bfloat16))
    a1b = c.relu(c.conv2d(x1b, cast(p["conv1.weight_s2d"]),
                          p.get("conv1.bias_s2d"), 1, 0))
    a1 = un_s2d(a1b, b, p["conv1.weight"].shape[-1])
    return x1b, a1


def pool_x1(x1b):
    n, h, w, _ = x1b.shape
    cc = p["block1.conv2.weight"].shape[-1]
    v = x1b.reshape(n, h, w, 2, 2, 2, 2, cc)
    pooled = jnp.max(jnp.max(v, axis=6), axis=4)
    return un_s2d(pooled.reshape(n, h, w, 4 * cc), 2, cc)


def upto_b2(ims):
    x1b, a1 = stem_a1(ims)
    x2 = c.res_block(pool_x1(x1b), p, "block2")
    a2 = c.relu(c.conv2d(x2, p["conv2.weight"], p.get("conv2.bias"), 1, 0))
    return a1, x2, a2


def upto_b3(ims):
    a1, x2, a2 = upto_b2(ims)
    x3 = c.res_block(c.max_pool(x2, 4), p, "block3")
    a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
    return a1, a2, x3, a3


def upto_b4(ims):
    a1, a2, x3, a3 = upto_b3(ims)
    x4 = c.res_block(c.max_pool(x3, 4), p, "block4")
    a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))
    return a1, a2, a3, a4


def full_feats(ims):
    return jax.vmap(lambda im: alike_s2d_feats(p, im[None]))(ims)


def _a1b(ims):
    x1b = stem_only(ims)
    cast = (lambda w: w.astype(jnp.bfloat16))
    a1b = c.relu(c.conv2d(x1b, cast(p["conv1.weight_s2d"]),
                          p.get("conv1.bias_s2d"), 1, 0))
    return x1b, a1b


t0 = timeit("stem (x1b)        ", stem_only)
t1 = timeit("stem+a1 (un_s2d)  ", stem_a1)
t1c = timeit("stem+a1b no un_s2d", _a1b)
t2 = timeit("+block2/a2        ", upto_b2)
t3 = timeit("+block3/a3        ", upto_b3)
t4 = timeit("+block4/a4        ", upto_b4)
t5 = timeit("full feats (score)", full_feats)
print(f"marginals/map: a1 {(t1 - t0) / BATCH * 1e6:.0f}us "
      f"(block-layout only {(t1c - t0) / BATCH * 1e6:.0f}us), "
      f"b2 {(t2 - t1) / BATCH * 1e6:.0f}us, b3 {(t3 - t2) / BATCH * 1e6:.0f}us, "
      f"b4 {(t4 - t3) / BATCH * 1e6:.0f}us, "
      f"score-head {(t5 - t4) / BATCH * 1e6:.0f}us", flush=True)

# ---- sampling variant: mul+sum second contraction instead of the k-batched
# matvec einsum
orig = sd._apply_weight_mats


def _apply_mulsum(feat, rbase, wr, cbase, wc):
    h, w = feat.shape[0], feat.shape[1]
    dt = feat.dtype
    Wr = sd._axis_weight_matrix(rbase, wr, h, dt)
    Wc = sd._axis_weight_matrix(cbase, wc, w, dt)
    t = jnp.einsum("kh,hwc->kwc", Wr, feat,
                   preferred_element_type=jnp.float32)
    return jnp.sum(Wc.astype(jnp.float32)[:, :, None] * t, axis=1)


def samp_step(ims):
    s, f = full_feats(ims)
    k, vv = detection_batch(s[:, 0, :, :, 0], dp)
    d = jax.vmap(lambda f1, f2, f3, f4, kk: sd.alike_sparse_descriptors(
        p, (f1, f2, f3, f4), kk, SIZE, SIZE))(*[x[:, 0] for x in f], k)
    return d


ta = timeit("fwd+det+samp einsum", samp_step)
sd._apply_weight_mats = _apply_mulsum
# new jit (function identity changed inside alike_sparse_descriptors? it
# reads the module attr at trace time via sample_* -> _apply_weight_mats)
tb = timeit("fwd+det+samp mulsum", samp_step)
sd._apply_weight_mats = orig
print(f"sampling second-contraction delta: "
      f"{(ta - tb) / BATCH * 1e6:.0f} us/map", flush=True)
