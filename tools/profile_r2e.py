"""Perf round 5: share breakdown at the big-batch sweet spot (batch 32
images here — fits quick), post fused-upsample head."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=8, warmup=2, label=""):
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
    from keypoint_bench_tpu.models.common import cast_params_bf16
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.matching import brute_force_match
    from keypoint_bench_tpu.ops.grid_sample import sample_at_points
    from keypoint_bench_tpu.weights import load_params

    print("devices:", jax.devices(), flush=True)
    B = 32  # images
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 512, 512, 3), np.float32))
    p = cast_params_bf16(load_params("Alike_s2d"))
    model = get_model("Alike_s2d")
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    full = jax.jit(lambda im: model(p, im))
    t_fwd = bench(full, imgs, label=f"forward x{B} images")
    score, desc = full(imgs)
    smap = jax.block_until_ready(score[..., 0])

    det_b = jax.jit(lambda ms: jax.vmap(lambda m: detection(m, dp))(ms))
    t_det = bench(det_b, smap, label=f"detection x{B}")
    kpts, valid = det_b(smap)

    samp = jax.jit(jax.vmap(sample_at_points))
    t_s = bench(samp, desc, kpts, label=f"desc sampling x{B}")

    from keypoint_bench_tpu.ops.matching import mutual_nn_match
    d0 = samp(desc, kpts)
    match = jax.jit(jax.vmap(
        lambda a_, b_, va, vb: mutual_nn_match(a_, b_, va, vb, 5.0)))
    t_m = bench(match, d0[:B // 2], d0[B // 2:], valid[:B // 2],
                valid[B // 2:], label=f"matching x{B // 2} pairs")

    def pair_step(img0, img1):
        s0, dm0 = model(p, img0[None])
        s1, dm1 = model(p, img1[None])
        k0, v0 = detection(s0[0], dp)
        k1, v1 = detection(s1[0], dp)
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, dm0[0], dm1[0], 5.0)
        return jnp.sum(ok), k0, m1

    step = jax.jit(jax.vmap(pair_step))
    t = bench(step, imgs[:B // 2], imgs[B // 2:],
              label=f"pair_step x{B // 2} pairs")
    if t:
        print(f"    -> {B / (t / 1e3):.1f} frames/s", flush=True)

    # NMS round statistics at this batch: how many rounds does the batched
    # while_loop run (max over maps)?
    from keypoint_bench_tpu.ops.detect import fast_nms
    for cap in (6, 8, 10, 12, 30):
        f = jax.jit(jax.vmap(lambda m: fast_nms(m.astype(jnp.float32), 6,
                                                cap)))
        bench(f, smap, label=f"fast_nms cap={cap} x{B}")


if __name__ == "__main__":
    main()
