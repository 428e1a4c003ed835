"""Benchmark: ALIKE-t extract+match frames/s on one TPU chip.

Runs the flagship pipeline (ALIKE-t forward x2, fixpoint-NMS detection
top_k=1000, brute-force mutual-NN matching — the reference default-config
protocol at 512x512) as one jitted batched program and reports frames/s.

vs_baseline compares against the PyTorch reference implementation measured on
this host (baselines/torch_cpu.json — no CUDA GPU is available here, so the
baseline hardware is the host CPU; the reference publishes no latency numbers,
SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.matching import brute_force_match
    from keypoint_bench_tpu.weights import load_params

    from keypoint_bench_tpu.models.common import cast_params_bf16

    # Alike_s2d = same checkpoint, space-to-depth stem layout (exact math,
    # ~10x faster full-res convs on TPU — models/alike_s2d.py)
    model_name = os.environ.get("KBT_BENCH_MODEL", "Alike_s2d")
    model_fn = get_model(model_name)
    params = load_params(model_name)
    if os.environ.get("KBT_BENCH_PRECISION", "bfloat16") == "bfloat16":
        params = cast_params_bf16(params)  # bf16 MXU path, f32 accumulate
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    def pair_step(img0, img1):
        s0, d0 = model_fn(params, img0[None])
        s1, d1 = model_fn(params, img1[None])
        k0, v0 = detection(s0[0], dp)
        k1, v1 = detection(s1[0], dp)
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, d0[0], d1[0], 5.0)
        return jnp.sum(ok), k0, m1

    # sweet spot: 4 for the reference layout (HBM working set); the fast
    # layout keeps scaling (8: 474, 16: 509, 32: 549, 64: 591, 96: 619,
    # 128: 576 fps measured)
    default_batch = "96" if model_name == "Alike_s2d" else "4"
    batch = int(os.environ.get("KBT_BENCH_BATCH", default_batch))
    step = jax.jit(jax.vmap(pair_step))

    rng = np.random.default_rng(0)
    imgs0 = jnp.asarray(rng.random((batch, 512, 512, 3), np.float32))
    imgs1 = jnp.asarray(rng.random((batch, 512, 512, 3), np.float32))

    # compile + warmup
    jax.block_until_ready(step(imgs0, imgs1))
    jax.block_until_ready(step(imgs0, imgs1))

    iters = int(os.environ.get("KBT_BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(imgs0, imgs1)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 2.0 * batch / dt

    baseline_fps = None
    bpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "baselines", "torch_cpu.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            baseline_fps = json.load(f)["frames_per_second"]

    print(json.dumps({
        "metric": "alike_t_extract_match_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
    }))


if __name__ == "__main__":
    main()
