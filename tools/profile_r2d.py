"""Perf experiments round 4: where does the fast forward spend its time, and
what's next (batch sweep, low-res block s2d, detection/sampling shares)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=12, warmup=2, label=""):
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
    from keypoint_bench_tpu.models.alike_s2d import un_s2d, _bn_s2d
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.matching import brute_force_match
    from keypoint_bench_tpu.weights import load_params

    print("devices:", jax.devices(), flush=True)
    B = 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 512, 512, 3), np.float32))
    p = cast_params_bf16(load_params("Alike_s2d"))
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)
    model = get_model("Alike_s2d")

    # ---- substages of the fast forward -------------------------------------
    print("== fast forward substages (batch 8) ==", flush=True)

    def stem(im):
        w8 = p["block1.conv1.weight_s2d8"]
        dn = jax.lax.conv_dimension_numbers(im.shape, w8.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            im.astype(w8.dtype), w8, (4, 4), [(1, 3), (1, 3)],
            dimension_numbers=dn, preferred_element_type=jnp.bfloat16)
        y = c.relu(_bn_s2d(y, p, "block1.bn1"))
        y = c.conv2d(y, p["block1.conv2.weight_s2d"], None, 1, 1)
        return c.relu(_bn_s2d(y, p, "block1.bn2"))

    t = bench(jax.jit(stem), imgs, label="stem (conv8 + conv3x3 blk)")
    x1b = jax.jit(stem)(imgs)

    def a1_part(x1b_):
        a1b = c.relu(c.conv2d(x1b_, p["conv1.weight_s2d"], None, 1, 0))
        return un_s2d(a1b, 4, 16)
    bench(jax.jit(a1_part), x1b, label="a1 conv + un_s2d")
    a1 = jax.jit(a1_part)(x1b)

    def low_res(x1b_):
        n, h, w, _ = x1b_.shape
        v = x1b_.reshape(n, h, w, 2, 2, 2, 2, 8)
        pooled = jnp.max(jnp.max(v, axis=6), axis=4)
        x1p = un_s2d(pooled.reshape(n, h, w, 32), 2, 8)
        x2 = c.res_block(x1p, p, "block2")
        x3 = c.res_block(c.max_pool(x2, 4), p, "block3")
        x4 = c.res_block(c.max_pool(x3, 4), p, "block4")
        a2 = c.relu(c.conv2d(x2, p["conv2.weight"], p.get("conv2.bias"), 1, 0))
        a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
        a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))
        return a2, a3, a4
    bench(jax.jit(low_res), x1b, label="pool + blocks2-4 + branches")
    a2, a3, a4 = jax.jit(low_res)(x1b)

    def head_part(a1_, a2_, a3_, a4_):
        wh = p["convhead2.weight"][0, 0]
        hp = None

        def proj(a, i):
            whi = wh[i * 16:(i + 1) * 16]
            d = jnp.einsum("bhwc,cd->bhwd", a, whi[:, :-1], precision=hp)
            s = jnp.einsum("bhwc,c->bhw", a, whi[:, -1], precision=hp)
            return d, s[..., None]
        d1, s1 = proj(a1_, 0)
        d2, s2 = proj(a2_, 1)
        d3, s3 = proj(a3_, 2)
        d4, s4 = proj(a4_, 3)
        d2 = c.upsample_bilinear_align(d2, 2)
        d3 = c.upsample_bilinear_align(d3, 8)
        d4 = c.upsample_bilinear_align(d4, 32)
        s2 = c.upsample_bilinear_align(s2, 2)
        s3 = c.upsample_bilinear_align(s3, 8)
        s4 = c.upsample_bilinear_align(s4, 32)
        desc = d1 + d2 + d3 + d4
        score = s1 + s2 + s3 + s4
        return jax.nn.sigmoid(score.astype(jnp.float32)), desc
    bench(jax.jit(head_part), a1, a2, a3, a4,
          label="projections + upsamples + adds")

    full = jax.jit(lambda im: model(p, im))
    bench(full, imgs, label="FULL fast forward")
    score, desc = full(imgs)
    smap = jax.block_until_ready(score[..., 0])

    det_b = jax.jit(lambda ms: jax.vmap(lambda m: detection(m, dp))(ms))
    bench(det_b, smap, label="detection x8")

    # ---- low-res s2d prototype: block2-shaped convs ------------------------
    print("== block2 s2d prototype (timing only, random weights) ==",
          flush=True)
    x256 = jnp.asarray(rng.random((B, 256, 256, 8)), jnp.bfloat16)
    w_a = jnp.asarray(rng.normal(0, .1, (3, 3, 8, 16)), jnp.bfloat16)
    w_b = jnp.asarray(rng.normal(0, .1, (3, 3, 16, 16)), jnp.bfloat16)
    w_d = jnp.asarray(rng.normal(0, .1, (1, 1, 8, 16)), jnp.bfloat16)

    def rb_ref(x):
        idn = c.conv2d(x, w_d, None, 1, 0)
        y = c.relu(c.conv2d(x, w_a, None, 1, 1))
        y = c.conv2d(y, w_b, None, 1, 1)
        return c.relu(y + idn)
    bench(jax.jit(rb_ref), x256, label="res_block 8->16 @256^2 (reference)")

    x128 = jnp.asarray(rng.random((B, 128, 128, 32)), jnp.bfloat16)
    w_a2 = jnp.asarray(rng.normal(0, .1, (3, 3, 32, 64)), jnp.bfloat16)
    w_b2 = jnp.asarray(rng.normal(0, .1, (3, 3, 64, 64)), jnp.bfloat16)
    w_d2 = jnp.asarray(rng.normal(0, .1, (1, 1, 32, 64)), jnp.bfloat16)

    def rb_s2d(x):
        idn = c.conv2d(x, w_d2, None, 1, 0)
        y = c.relu(c.conv2d(x, w_a2, None, 1, 1))
        y = c.conv2d(y, w_b2, None, 1, 1)
        return c.relu(y + idn)
    bench(jax.jit(rb_s2d), x128, label="res_block s2d2 32->64 @128^2")

    # ---- batch sweep --------------------------------------------------------
    print("== pair_step batch sweep (fast forward) ==", flush=True)

    def pair_step(img0, img1):
        s0, dm0 = model(p, img0[None])
        s1, dm1 = model(p, img1[None])
        k0, v0 = detection(s0[0], dp)
        k1, v1 = detection(s1[0], dp)
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, dm0[0], dm1[0], 5.0)
        return jnp.sum(ok), k0, m1

    for bb in (2, 4, 8):
        ii = jnp.asarray(rng.random((2 * bb, 512, 512, 3), np.float32))
        step = jax.jit(jax.vmap(pair_step))
        t = bench(step, ii[:bb], ii[bb:], label=f"pair_step batch {bb}")
        if t:
            print(f"    -> {2 * bb / (t / 1e3):.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
