"""Round-2 perf experiment harness. ONE process, many measurements (TPU claim
+ remote compiles dominate otherwise — CLAUDE.md). Prints results as it goes.

Usage: timeout 1800 python tools/profile_r2.py
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
        print(f"  {label:55s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:  # noqa
        print(f"  {label:55s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.models import common as c
    from keypoint_bench_tpu.models.common import cast_params_bf16
    from keypoint_bench_tpu.ops import detect as Dmod
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.pallas_nms import fast_nms_pallas
    from keypoint_bench_tpu.ops.detect import fast_nms
    from keypoint_bench_tpu.ops.matching import brute_force_match, mutual_nn_match
    from keypoint_bench_tpu.ops.grid_sample import sample_at_points
    from keypoint_bench_tpu.weights import load_params

    print("devices:", jax.devices(), flush=True)
    model_fn = get_model("Alike")
    params_f32 = load_params("Alike")
    params = cast_params_bf16(params_f32)
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    B = 8  # images (bench batch 4 pairs = 8 images)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 512, 512, 3), np.float32))

    # ---- forward substages ----------------------------------------------
    print("== forward substages (batch 8 images) ==", flush=True)

    def block1_only(p, img):
        return c.conv_block(img, p, "block1")

    t_b1_bf = bench(jax.jit(lambda im: block1_only(params, im)), imgs,
                    label="block1 bf16")
    t_b1_f32 = bench(jax.jit(lambda im: block1_only(params_f32, im)), imgs,
                     label="block1 f32")

    # bare convs, several widths/precisions
    for cc, dt_ in [(8, jnp.bfloat16), (8, jnp.float32),
                    (32, jnp.bfloat16), (128, jnp.bfloat16)]:
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, cc, cc)), dt_)
        x = jnp.asarray(rng.random((B, 512, 512, cc)), dt_)
        bench(jax.jit(lambda x_, w_: c.conv2d(x_, w_)), x, w,
              label=f"bare conv3x3 {cc}->{cc} @512^2 {dt_.__name__}")

    # space-to-depth prototype: 3x3 conv at 512^2/8ch == 2x2 conv at 256^2/32ch
    for blk, cc in [(2, 8), (4, 8)]:
        cin_b = cc * blk * blk
        w = jnp.asarray(rng.normal(0, 0.1, (blk, blk, cin_b, cin_b)),
                        jnp.bfloat16)
        x = jnp.asarray(rng.random((B, 512 // blk, 512 // blk, cin_b)),
                        jnp.bfloat16)
        bench(jax.jit(lambda x_, w_: c.conv2d(x_, w_, padding="SAME")), x, w,
              label=f"s2d conv{blk}x{blk} {cin_b}ch @{512//blk}^2 bf16")

    def full(p, im):
        return model_fn(p, im)
    t_fwd_bf = bench(jax.jit(lambda im: full(params, im)), imgs,
                     label="FULL forward bf16")
    t_fwd_f32 = bench(jax.jit(lambda im: full(params_f32, im)), imgs,
                      label="FULL forward f32")

    # head alone: concat+1x1(64->65)+sigmoid on a random 64ch map
    agg = jnp.asarray(rng.random((B, 512, 512, 64)), jnp.bfloat16)
    wh = params["convhead2.weight"]
    bh = params_f32.get("convhead2.bias")

    def head_only(a):
        h = c.conv2d(a, wh, bh, 1, 0)
        return h[..., :-1], jax.nn.sigmoid(h[..., -1:])
    bench(jax.jit(head_only), agg, label="head 1x1 64->65 + sigmoid bf16")

    # upsample alone
    a2 = jnp.asarray(rng.random((B, 256, 256, 16)), jnp.bfloat16)
    bench(jax.jit(lambda a: c.upsample_bilinear_align(a, 2)), a2,
          label="upsample x2 (16ch 256->512) bf16")

    score, desc = jax.jit(lambda im: full(params, im))(imgs)
    score = jax.block_until_ready(score)

    # ---- NMS / detection --------------------------------------------------
    print("== detection (real ALIKE score maps, nms=6) ==", flush=True)
    smap = score[..., 0]  # [B, H, W]

    xla_det = jax.jit(jax.vmap(lambda m: fast_nms(m.astype(jnp.float32), 6, 30)))
    pal_det = jax.jit(jax.vmap(lambda m: fast_nms_pallas(m.astype(jnp.float32), 6, 30)))
    t_xla = bench(xla_det, smap, label="fast_nms XLA (mask-carried) x8 maps")
    t_pal = bench(pal_det, smap, label="fast_nms Pallas fixpoint x8 maps")
    pallas_ok = t_pal is not None
    if pallas_ok:
        a = np.asarray(xla_det(smap))
        b = np.asarray(pal_det(smap))
        print(f"  parity on real maps: {np.allclose(a, b)}  "
              f"(max diff {np.abs(a - b).max():.3e})", flush=True)

    Dmod.set_nms_impl("pallas" if pallas_ok else "xla")
    det_b = jax.jit(lambda ms: jax.vmap(lambda m: detection(m, dp))(ms))
    bench(det_b, smap, label=f"full detection x8 (nms={Dmod._NMS_IMPL[0]})")

    # ---- descriptor sampling ---------------------------------------------
    print("== descriptor sampling (1000 pts x 64ch from 512^2) ==", flush=True)
    kpts, valid = det_b(smap)
    kpts = jax.block_until_ready(kpts)

    samp_cur = jax.jit(jax.vmap(sample_at_points))
    bench(samp_cur, desc, kpts, label="current (4 separate gathers)")

    def sample_stacked(fm, kp):
        h, w = fm.shape[0], fm.shape[1]
        px = kp[:, 0] * (w - 1)
        py = kp[:, 1] * (h - 1)
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        dx = (px - x0)[:, None]; dy = (py - y0)[:, None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        rows = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])      # [4, K]
        cols = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])
        inb = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
        lin = jnp.clip(rows, 0, h - 1) * w + jnp.clip(cols, 0, w - 1)
        v = fm.reshape(h * w, -1)[lin.reshape(-1)].reshape(4, kp.shape[0], -1)
        v = jnp.where(inb[..., None], v, 0)
        wts = jnp.stack([(1 - dy) * (1 - dx), (1 - dy) * dx,
                         dy * (1 - dx), dy * dx])
        return jnp.sum(wts * v, axis=0)

    samp_st = jax.jit(jax.vmap(sample_stacked))
    bench(samp_st, desc, kpts, label="stacked single gather (4K idx)")

    def sample_onehot(fm, kp):
        h, w = fm.shape[0], fm.shape[1]
        px = kp[:, 0] * (w - 1); py = kp[:, 1] * (h - 1)
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        dx = px - x0; dy = py - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        iw = jnp.arange(w)[None, :]; ih = jnp.arange(h)[None, :]
        Wc = ((iw == x0i[:, None]) * (1 - dx)[:, None]
              + (iw == (x0i + 1)[:, None]) * dx[:, None])  # [K, W]
        Wr = ((ih == y0i[:, None]) * (1 - dy)[:, None]
              + (ih == (y0i + 1)[:, None]) * dy[:, None])  # [K, H]
        Wc = Wc.astype(fm.dtype); Wr = Wr.astype(fm.dtype)
        g = jnp.einsum("kw,hwc->khc", Wc, fm)               # [K, H, C]
        return jnp.einsum("kh,khc->kc", Wr, g)
    samp_oh = jax.jit(jax.vmap(sample_onehot))
    bench(samp_oh, desc, kpts, label="two-stage one-hot matmul")

    a = np.asarray(samp_cur(desc, kpts), np.float32)
    b = np.asarray(samp_st(desc, kpts), np.float32)
    print(f"  stacked parity: {np.allclose(a, b, atol=1e-2)}", flush=True)

    # ---- matching ----------------------------------------------------------
    print("== matching ==", flush=True)
    d0 = samp_cur(desc, kpts)
    match = jax.jit(jax.vmap(lambda a_, b_, va, vb: mutual_nn_match(a_, b_, va, vb, 5.0)))
    bench(match, d0[:4], d0[4:], valid[:4], valid[4:], label="mutual-NN match x4 pairs")

    # ---- end-to-end bench step --------------------------------------------
    print("== end-to-end pair step (batch 4 pairs) ==", flush=True)

    def pair_step(img0, img1):
        s0, dm0 = model_fn(params, img0[None])
        s1, dm1 = model_fn(params, img1[None])
        k0, v0 = detection(s0[0], dp)
        k1, v1 = detection(s1[0], dp)
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, dm0[0], dm1[0], 5.0)
        return jnp.sum(ok), k0, m1

    i0, i1 = imgs[:4], imgs[4:]
    impls = ["xla"] + (["pallas"] if pallas_ok else [])
    for impl in impls:
        Dmod.set_nms_impl(impl)
        step = jax.jit(jax.vmap(pair_step))
        t = bench(step, i0, i1, label=f"pair_step nms={impl} (4 pairs)")
        if t:
            print(f"    -> {8.0 / (t / 1e3):.1f} frames/s", flush=True)
    Dmod.set_nms_impl("auto")


if __name__ == "__main__":
    main()
