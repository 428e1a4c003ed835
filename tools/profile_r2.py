"""Round-2 perf experiment harness. ONE process, many measurements (TPU claim
+ remote compiles dominate otherwise — CLAUDE.md). Prints results as it goes.

Usage: timeout 1500 python tools/profile_r2.py
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
        print(f"  {label:55s} FAILED: {type(e).__name__}: {str(e)[:200]}",
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
    params = cast_params_bf16(load_params("Alike"))
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    B = 8  # images (bench batch 4 pairs = 8 images)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 512, 512, 3), np.float32))

    # ---- forward substages ----------------------------------------------
    print("== forward substages (batch 8 images, bf16) ==", flush=True)

    def encoder(img):
        x1 = c.conv_block(img, params, "block1")
        x2 = c.res_block(c.max_pool(x1, 2), params, "block2")
        x3 = c.res_block(c.max_pool(x2, 4), params, "block3")
        x4 = c.res_block(c.max_pool(x3, 4), params, "block4")
        return x1, x2, x3, x4

    def block1_only(img):
        return c.conv_block(img, params, "block1")

    def branches(img):
        x1, x2, x3, x4 = encoder(img)
        a1 = c.relu(c.conv2d(x1, params["conv1.weight"], params.get("conv1.bias"), 1, 0))
        a2 = c.relu(c.conv2d(x2, params["conv2.weight"], params.get("conv2.bias"), 1, 0))
        a3 = c.relu(c.conv2d(x3, params["conv3.weight"], params.get("conv3.bias"), 1, 0))
        a4 = c.relu(c.conv2d(x4, params["conv4.weight"], params.get("conv4.bias"), 1, 0))
        return a1, a2, a3, a4

    def up_only(img):
        a1, a2, a3, a4 = branches(img)
        return (a1, c.upsample_bilinear_align(a2, 2),
                c.upsample_bilinear_align(a3, 8),
                c.upsample_bilinear_align(a4, 32))

    full = jax.jit(lambda im: model_fn(params, im))
    t_b1 = bench(jax.jit(block1_only), imgs, label="block1 (2x conv3x3 @512^2, 8ch)")
    t_enc = bench(jax.jit(encoder), imgs, label="encoder block1-4")
    t_br = bench(jax.jit(branches), imgs, label="encoder + conv1-4 branches")
    t_up = bench(jax.jit(up_only), imgs, label="+ bilinear upsample x2/x8/x32")
    t_fwd = bench(full, imgs, label="FULL forward (concat+head+sigmoid)")

    score, desc = full(imgs)
    score = jax.block_until_ready(score)

    # ---- NMS / detection --------------------------------------------------
    print("== detection (real ALIKE score maps, nms=6) ==", flush=True)
    smap = score[..., 0]  # [B, H, W]

    xla_det = jax.jit(jax.vmap(lambda m: fast_nms(m.astype(jnp.float32), 6, 30)))
    pal_det = jax.jit(jax.vmap(lambda m: fast_nms_pallas(m.astype(jnp.float32), 6, 30)))
    t_xla = bench(xla_det, smap, label="fast_nms XLA (mask-carried) x8 maps")
    t_pal = bench(pal_det, smap, label="fast_nms Pallas fixpoint x8 maps")
    if t_pal is not None:
        a = np.asarray(xla_det(smap))
        b = np.asarray(pal_det(smap))
        print(f"  parity on real maps: {np.allclose(a, b)}  "
              f"(max diff {np.abs(a - b).max():.3e})", flush=True)

    # how many rounds does the fixpoint actually run on these maps?
    m0 = smap[0].astype(jnp.float32)
    prev = None
    for it in (2, 4, 8, 16, 30):
        out = np.asarray(fast_nms(m0, 6, it))
        conv = prev is not None and np.allclose(out, prev)
        print(f"  fixpoint rounds<={it}: stable_vs_prev={conv}", flush=True)
        prev = out

    det_b = jax.jit(lambda ms: jax.vmap(lambda m: detection(m, dp))(ms))
    bench(det_b, smap, label="full detection (NMS+border+topk) x8")

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
    a = np.asarray(samp_cur(desc, kpts), np.float32)
    b = np.asarray(samp_st(desc, kpts), np.float32)
    print(f"  stacked parity: {np.allclose(a, b, atol=1e-3)}", flush=True)

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

    step = jax.jit(jax.vmap(pair_step))
    i0, i1 = imgs[:4], imgs[4:]
    for impl in ("xla", "pallas"):
        Dmod.set_nms_impl(impl)
        step = jax.jit(jax.vmap(pair_step))
        t = bench(step, i0, i1, label=f"pair_step nms={impl} (4 pairs)")
        if t:
            print(f"    -> {8.0 / (t / 1e3):.1f} frames/s", flush=True)
    Dmod.set_nms_impl("auto")


if __name__ == "__main__":
    main()
