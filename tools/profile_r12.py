"""Round-4 profile: fine-grained bisection of the dilated cm forward.

The forward is the dominant pipeline stage (~150-184 us/map of ~390) and
sol_pct says much of it is not bandwidth-justified. Before building the
strip-fused megakernel, measure where the time actually sits: cumulative
scalarized prefixes through the exact alike_s2d_feats_cm (dilated) graph at
bench conditions (512^2, batch 96, bf16).

Known FLOP floors at 512^2/map (bf16 MXU ~197 TFLOP/s):
  stem conv1 (8x8x3->128 @128^2, stride 4)  0.8 GFLOP  ~4 us
  stem conv2 (3x3 128->128 @128^2, s2d(4) = 16x inflated)  4.8 GFLOP ~24 us
  block2 (s2d(2): 3x3 32->64 x2 + 1x1 @128^2)  ~1.3 GFLOP ~7 us
  f1t emit (one-tap dilated, if XLA specializes)  1.1 GFLOP ~5 us
  everything else  < 5 us
HBM floor: ~14 MB/map unavoidable IO -> ~17 us. So a perfect fused forward
sits at ~45-60 us/map; the gap above that is scheduling/relayout/dispatch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.alike_s2d import (_B, _bn_s2d,
                                                 _branch_cm_dilated,
                                                 _combined_up_1ch,
                                                 alike_s2d_feats_cm)
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.weights import load_params

BATCH = int(os.environ.get("R12_BATCH", "96"))
SIZE = int(os.environ.get("R12_SIZE", "512"))
params = cast_params_bf16(load_params("Alike_s2d"))


def scalarize(t):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(t))


def stages(image):
    """Yield (name, value-tree) cut points replicating _branches dilated +
    alike_s2d_feats_cm. Each cut returns everything computed so far that

    is live, so XLA cannot dead-code prior stages."""
    p = params
    b = _B
    cast = lambda w: w.astype(jnp.bfloat16)
    hp = None

    out = []
    # stem conv1 (stride-4 w8 kernel on the raw image)
    w8 = cast(p["block1.conv1.weight_s2d8"])
    dn = jax.lax.conv_dimension_numbers(image.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y0 = jax.lax.conv_general_dilated(
        image.astype(w8.dtype), w8, (b, b), [(1, b - 1), (1, b - 1)],
        dimension_numbers=dn, precision=c._CONV_PRECISION[0],
        preferred_element_type=jnp.bfloat16)
    if "block1.conv1.bias_s2d" in p:
        y0 = y0 + p["block1.conv1.bias_s2d"]
    out.append(("conv1", y0))

    y = c.relu(_bn_s2d(y0, p, "block1.bn1"))
    y = c.conv2d(y, cast(p["block1.conv2.weight_s2d"]),
                 p.get("block1.conv2.bias_s2d"), 1, 1)
    x1b = c.relu(_bn_s2d(y, p, "block1.bn2"))
    out.append(("x1b", x1b))

    wh = cast(p["convhead2.weight"])[0, 0]
    per = p["conv1.weight"].shape[-1]

    f1t = _branch_cm_dilated(x1b, cast(p["conv1.weight"])[0, 0],
                             p.get("conv1.bias"), _B, cast)
    out.append(("f1t", (x1b, f1t)))

    s1 = jnp.einsum("bchw,c->bhw", f1t, wh[:per, -1], precision=hp)[..., None]
    out.append(("s1", (x1b, f1t, s1)))

    n, h, w, _ = x1b.shape
    cc = p["block1.conv2.weight"].shape[-1]
    v = x1b.reshape(n, h, w, 2, 2, 2, 2, cc)
    pooled = jnp.max(jnp.max(v, axis=6), axis=4).reshape(n, h, w, 4 * cc)
    out.append(("pool", (f1t, s1, pooled)))

    idn = c.conv2d(pooled, cast(p["block2.downsample.weight_s2d2"]),
                   p.get("block2.downsample.bias_s2d2"), 1, 0)
    y = c.conv2d(pooled, cast(p["block2.conv1.weight_s2d2"]),
                 p.get("block2.conv1.bias_s2d2"), 1, 1)
    y = c.relu(c.bn_eval(y, p["block2.bn1.weight_s2d2"],
                         p["block2.bn1.bias_s2d2"],
                         p["block2.bn1.running_mean_s2d2"],
                         p["block2.bn1.running_var_s2d2"]))
    y = c.conv2d(y, cast(p["block2.conv2.weight_s2d2"]),
                 p.get("block2.conv2.bias_s2d2"), 1, 1)
    y = c.bn_eval(y, p["block2.bn2.weight_s2d2"],
                  p["block2.bn2.bias_s2d2"],
                  p["block2.bn2.running_mean_s2d2"],
                  p["block2.bn2.running_var_s2d2"])
    x2b = c.relu(y + idn)
    out.append(("x2b", (f1t, s1, x2b)))

    f2t = _branch_cm_dilated(x2b, cast(p["conv2.weight"])[0, 0],
                             p.get("conv2.bias"), 2, cast)
    out.append(("f2t", (f1t, s1, x2b, f2t)))

    s2 = jnp.einsum("bchw,c->bhw", f2t, wh[per:2 * per, -1],
                    precision=hp)[..., None]
    out.append(("s2", (f1t, s1, x2b, f2t, s2)))

    cc2 = p["block2.conv2.weight"].shape[-1]
    m = jnp.max(x2b.reshape(n, h, w, 2, 2, cc2), axis=(3, 4))
    x3_in = c.max_pool(m, 2)
    x3 = c.res_block(x3_in, p, "block3")
    x4 = c.res_block(c.max_pool(x3, 4), p, "block4")
    a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
    a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))

    def proj_s(a, i):
        return jnp.einsum("bhwc,c->bhw", a, wh[i * per:(i + 1) * per, -1],
                          precision=hp)[..., None]

    s3 = proj_s(a3, 2)
    s4 = proj_s(a4, 3)
    out.append(("trunk34", (f1t, s1, f2t, s2, a3, a4, s3, s4)))

    H, W = h * _B, w * _B
    score = s1 + _combined_up_1ch((s2, s3, s4), H, W, hp)
    bh = p.get("convhead2.bias")
    if bh is not None:
        score = score + bh[-1]
    score = jax.nn.sigmoid(score.astype(jnp.float32)).astype(f1t.dtype)
    out.append(("score", (score, f1t, f2t,
                          jnp.transpose(a3, (0, 3, 1, 2)),
                          jnp.transpose(a4, (0, 3, 1, 2)))))
    return out


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
    imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                 for _ in range(BATCH)]))
    names = ["conv1", "x1b", "f1t", "s1", "pool", "x2b", "f2t", "s2",
             "trunk34", "score"]
    prev = 0.0
    for i, name in enumerate(names):
        f = jax.jit(lambda a, i=i: scalarize(stages(a)[i][1]))
        t = timeit(f, imgs)
        print(f"{name:>8}: cum {t * 1e3:7.2f} ms  marg "
              f"{(t - prev) / BATCH * 1e6:6.1f} us/map")
        prev = t

    # reference: the shipped forward end-to-end
    f = jax.jit(lambda a: scalarize(alike_s2d_feats_cm(params, a)))
    t = timeit(f, imgs)
    print(f"feats_cm: cum {t * 1e3:7.2f} ms  ({t / BATCH * 1e6:6.1f} us/map)")

    # A/B: conv1 as w8-on-raw (stride 4, 3 in-channels — XLA may pad the
    # 3-channel contraction to 128 lanes per tap) vs explicit s2d reshape +
    # dense [3,3,48,128] block conv (48-channel contraction)
    from keypoint_bench_tpu.models.alike_s2d import s2d

    def conv1_s2d(image):
        xb = s2d(image.astype(jnp.bfloat16), _B)
        y = c.conv2d(xb, params["block1.conv1.weight_s2d"].astype(
            jnp.bfloat16), params.get("block1.conv1.bias_s2d"), 1, 1)
        return y

    f = jax.jit(lambda a: scalarize(conv1_s2d(a)))
    t = timeit(f, imgs)
    print(f"conv1 via s2d+blkconv: {t * 1e3:7.2f} ms  "
          f"({t / BATCH * 1e6:6.1f} us/map)")

    # A/B: conv1 as pure patch-matmul (exact same math): s2d without halo
    # gives non-overlapping 4x4 patches; the 8x8 stride-4 window is the
    # 2x2 neighbourhood of those patches -> K = 4*48 = 192 dense matmul
    w8 = params["block1.conv1.weight_s2d8"].astype(jnp.bfloat16)  # [8,8,3,128]

    def conv1_matmul(image):
        xb = s2d(image.astype(jnp.bfloat16), _B)      # [B,128,128,48]
        n, hb, wb, cb = xb.shape
        # patches p(y, x) covering blocks (y+dy, x+dx), dy,dx in {0,1},
        # with the w8 padding (1, 3): window top-left at 4Y-1 -> taps
        # dy in 0..7 = rows 4Y-1 .. 4Y+6 span blocks Y-1(row 3) .. Y+1
        # -> reformulate on the [3,3,48,128] block kernel instead
        # TIMING-ONLY approximation: jnp.roll wraps at edges (production
        # would mask); cost is representative of the shifted-matmul form
        wblk = params["block1.conv1.weight_s2d"].astype(jnp.bfloat16)
        acc = None
        for by in (0, 1, 2):
            for bx in (0, 1, 2):
                kmat = wblk[by, bx]                   # [48, 128]
                sh = jnp.roll(jnp.roll(xb, 1 - by, 1), 1 - bx, 2)
                t_ = jnp.einsum("bhwc,cd->bhwd", sh, kmat)
                acc = t_ if acc is None else acc + t_
        return acc

    f = jax.jit(lambda a: scalarize(conv1_matmul(a)))
    t = timeit(f, imgs)
    print(f"conv1 via 9-shift matmul: {t * 1e3:7.2f} ms  "
          f"({t / BATCH * 1e6:6.1f} us/map)")


if __name__ == "__main__":
    main()
