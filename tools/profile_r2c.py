"""Perf experiments round 3: where did the s2d gains go?
Measures transpose costs, a conv6x6-stride-4 stem (s2d without the input
transpose), head formulations, and composed pair_step variants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10, warmup=2, label=""):
    try:
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {label:58s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:  # noqa
        print(f"  {label:58s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.models import common as c
    from keypoint_bench_tpu.models.common import cast_params_bf16
    from keypoint_bench_tpu.models.alike_s2d import (s2d, un_s2d,
                                                     transform_params_s2d)
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.matching import brute_force_match
    from keypoint_bench_tpu.weights import load_params

    print("devices:", jax.devices(), flush=True)
    B = 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 512, 512, 3), np.float32))
    params_f32 = load_params("Alike")
    params = cast_params_bf16(params_f32)
    ps2d = cast_params_bf16(load_params("Alike_s2d"))
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    # null dispatch overhead
    tiny = jnp.zeros((8,))
    bench(jax.jit(lambda x: x + 1), tiny, label="null dispatch (x+1 on [8])")

    # ---- transposes --------------------------------------------------------
    print("== layout transforms ==", flush=True)
    a1b = jnp.asarray(rng.random((B, 128, 128, 256)), jnp.bfloat16)
    bench(jax.jit(lambda x: un_s2d(x, 4, 16)), a1b,
          label="un_s2d a1 [8,128,128,256]->[8,512,512,16] bf16")
    bench(jax.jit(lambda x: s2d(x, 4)), imgs,
          label="s2d img [8,512,512,3] f32")
    x1b = jnp.asarray(rng.random((B, 128, 128, 128)), jnp.bfloat16)

    def pool_unblock(xb):
        n, h, w, _ = xb.shape
        v = xb.reshape(n, h, w, 2, 2, 2, 2, 8)
        pooled = jnp.max(jnp.max(v, axis=6), axis=4)
        return un_s2d(pooled.reshape(n, h, w, 32), 2, 8)
    bench(jax.jit(pool_unblock), x1b, label="pool+un_s2d x1p bf16")

    # ---- stem variants ----------------------------------------------------
    print("== stem variants (block1 + a1) ==", flush=True)

    def stem_ref(im):
        x1 = c.conv_block(im, params, "block1")
        a1 = c.relu(c.conv2d(x1, params["conv1.weight"],
                             params.get("conv1.bias"), 1, 0))
        return a1, c.max_pool(x1, 2)
    bench(jax.jit(stem_ref), imgs, label="stem reference layout")

    def stem_s2d(im):
        from keypoint_bench_tpu.models.alike_s2d import alike_s2d  # noqa
        xb = s2d(im, 4)
        y = c.conv2d(xb, ps2d["block1.conv1.weight_s2d"], None, 1, 1)
        y = c.relu(c.bn_eval(y, ps2d["block1.bn1.weight_s2d"],
                             ps2d["block1.bn1.bias_s2d"],
                             ps2d["block1.bn1.running_mean_s2d"],
                             ps2d["block1.bn1.running_var_s2d"]))
        y = c.conv2d(y, ps2d["block1.conv2.weight_s2d"], None, 1, 1)
        x1b_ = c.relu(c.bn_eval(y, ps2d["block1.bn2.weight_s2d"],
                                ps2d["block1.bn2.bias_s2d"],
                                ps2d["block1.bn2.running_mean_s2d"],
                                ps2d["block1.bn2.running_var_s2d"]))
        a1b_ = c.relu(c.conv2d(x1b_, ps2d["conv1.weight_s2d"], None, 1, 0))
        a1 = un_s2d(a1b_, 4, 16)
        n, h, w, _ = x1b_.shape
        v = x1b_.reshape(n, h, w, 2, 2, 2, 2, 8)
        pooled = jnp.max(jnp.max(v, axis=6), axis=4)
        return a1, un_s2d(pooled.reshape(n, h, w, 32), 2, 8)
    bench(jax.jit(stem_s2d), imgs, label="stem s2d (with transposes)")

    # conv6x6 stride4 = s2d + conv1_blk without the input transpose
    W1b = np.asarray(ps2d["block1.conv1.weight_s2d"], np.float32)  # [3,3,48,128]
    # rebuild as [6,6,3,128]: input block offset (beta_y, beta_x) pixel (r', s')
    # kernel tap at (4*beta_y + r' - (-1) ... ) — derive: out block I uses input
    # rows 4(I+by)+r = 4I + (4by+r); with 3x3 block kernel by in {-1,0,1} the
    # row span is 4I-4 .. 4I+7 (12 rows) — but nonzero entries only cover
    # 4I-1 .. 4I+6 (8 rows). conv6x6 can't hold an 8-row span; use conv8x8
    # stride 4 pad 1? lax pad spec allows asymmetric (1, 3).
    W8 = np.zeros((8, 8, 3, 128), np.float32)
    for by in (-1, 0, 1):
        for r in range(4):
            for bx in (-1, 0, 1):
                for s in range(4):
                    row = 4 * by + r + 1   # offset from 4I-1 -> tap index
                    col = 4 * bx + s + 1
                    if 0 <= row < 8 and 0 <= col < 8:
                        W8[row, col, :, :] += W1b[by + 1, bx + 1,
                                                  (r * 4 + s) * 3:
                                                  (r * 4 + s + 1) * 3, :]
    W8j = jnp.asarray(W8, jnp.bfloat16)

    def stem_conv8(im):
        y = jax.lax.conv_general_dilated(
            im.astype(jnp.bfloat16), W8j, (4, 4), [(1, 3), (1, 3)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                im.shape, W8j.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.bfloat16)
        y = c.relu(c.bn_eval(y, ps2d["block1.bn1.weight_s2d"],
                             ps2d["block1.bn1.bias_s2d"],
                             ps2d["block1.bn1.running_mean_s2d"],
                             ps2d["block1.bn1.running_var_s2d"]))
        y = c.conv2d(y, ps2d["block1.conv2.weight_s2d"], None, 1, 1)
        x1b_ = c.relu(c.bn_eval(y, ps2d["block1.bn2.weight_s2d"],
                                ps2d["block1.bn2.bias_s2d"],
                                ps2d["block1.bn2.running_mean_s2d"],
                                ps2d["block1.bn2.running_var_s2d"]))
        a1b_ = c.relu(c.conv2d(x1b_, ps2d["conv1.weight_s2d"], None, 1, 0))
        a1 = un_s2d(a1b_, 4, 16)
        n, h, w, _ = x1b_.shape
        v = x1b_.reshape(n, h, w, 2, 2, 2, 2, 8)
        pooled = jnp.max(jnp.max(v, axis=6), axis=4)
        return a1, un_s2d(pooled.reshape(n, h, w, 32), 2, 8)
    t8 = bench(jax.jit(stem_conv8), imgs, label="stem conv8x8-stride4 (no s2d transform)")
    if t8:
        a_ref = jax.jit(stem_ref)(imgs)
        a_new = jax.jit(stem_conv8)(imgs)
        d = float(jnp.abs(a_ref[0].astype(jnp.float32)
                          - a_new[0].astype(jnp.float32)).max())
        print(f"  conv8 stem a1 parity vs reference (bf16): {d:.4f}", flush=True)

    # ---- head variants -----------------------------------------------------
    print("== head variants (64->65 @512^2) ==", flush=True)
    agg = jnp.asarray(rng.random((B, 512, 512, 64)), jnp.bfloat16)
    wh = params["convhead2.weight"]
    bh = params_f32.get("convhead2.bias")

    bench(jax.jit(lambda a: c.conv2d(a, wh, bh, 1, 0)), agg,
          label="head as 1x1 conv")

    whm = wh.reshape(64, 65)

    def head_mm(a):
        n, h, w, cc = a.shape
        y = jnp.dot(a.reshape(-1, cc), whm,
                    preferred_element_type=jnp.bfloat16)
        return (y + bh.astype(jnp.bfloat16)).reshape(n, h, w, 65)
    bench(jax.jit(head_mm), agg, label="head as reshaped matmul")

    # sum-of-matmuls head: no concat materialization
    a1 = jnp.asarray(rng.random((B, 512, 512, 16)), jnp.bfloat16)
    parts = [a1] + [jnp.asarray(rng.random((B, 512, 512, 16)), jnp.bfloat16)
                    for _ in range(3)]
    whs = [whm[i * 16:(i + 1) * 16] for i in range(4)]

    def head_sum(p0, p1, p2, p3):
        acc = None
        for a, w in zip((p0, p1, p2, p3), whs):
            y = jnp.dot(a.reshape(-1, 16), w,
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return (acc + bh).astype(jnp.bfloat16).reshape(B, 512, 512, 65)
    bench(jax.jit(head_sum), *parts, label="head as sum of 4 matmuls (no concat)")

    def head_concat_full(p0, p1, p2, p3):
        agg_ = jnp.concatenate([p0, p1, p2, p3], axis=-1)
        return c.conv2d(agg_, wh, bh, 1, 0)
    bench(jax.jit(head_concat_full), *parts, label="concat + 1x1 conv head")

    # ---- composed pair steps ----------------------------------------------
    print("== composed pair_step variants (4 pairs) ==", flush=True)

    def make_step(model_name, p):
        fn = get_model(model_name)

        def pair_step(img0, img1):
            s0, dm0 = fn(p, img0[None])
            s1, dm1 = fn(p, img1[None])
            k0, v0 = detection(s0[0], dp)
            k1, v1 = detection(s1[0], dp)
            m0, m1, ok = brute_force_match(k0, v0, k1, v1, dm0[0], dm1[0], 5.0)
            return jnp.sum(ok), k0, m1
        return jax.jit(jax.vmap(pair_step))

    i0, i1 = imgs[:4], imgs[4:]
    for name, p in [("Alike", params), ("Alike_s2d", ps2d)]:
        t = bench(make_step(name, p), i0, i1, label=f"pair_step {name}")
        if t:
            print(f"    -> {8.0 / (t / 1e3):.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
