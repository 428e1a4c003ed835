"""Round-4: measured per-chip throughput of the re-engineered DP eval step.

The sharded eval step (parallel/evaluate.py) now uses the natively batched
forward + detection_batch (round-3 verdict item 3). This tool times the full
batched repeatability step (model x2, detection x2, warps, rep metrics, BF
match, 256-hypothesis RANSAC homography) on ONE chip at bench conditions —
the projected DP per-chip throughput is this number; multi-chip DP shards
pairs with zero cross-device traffic except the final [B]-scalar gather.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.ops.detect import DetectParams
from keypoint_bench_tpu.parallel.evaluate import batched_repeatability_step

BATCH = int(os.environ.get("R13_BATCH", "48"))
SIZE = int(os.environ.get("R13_SIZE", "512"))


def main():
    model_fn = get_model("Alike_s2d")
    from keypoint_bench_tpu.weights import load_params
    params = load_params("Alike_s2d")
    if os.environ.get("R13_PRECISION", "bfloat16") == "bfloat16":
        params = cast_params_bf16(params)
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    imgs0_np = np.stack([_texture(SIZE, SIZE, rng) for _ in range(BATCH)])
    imgs1_np = np.stack([_texture(SIZE, SIZE, rng) for _ in range(BATCH)])
    if os.environ.get("R13_HOST_S2D", "0") == "1":
        # host-side s2d input layout (the prefetcher's s2d emit — free at
        # decode; deletes the in-graph stem conv1 layout cost)
        from keypoint_bench_tpu.models.alike_s2d import host_s2d_images
        imgs0_np = host_s2d_images(imgs0_np)
        imgs1_np = host_s2d_images(imgs1_np)
    imgs0 = jnp.asarray(imgs0_np)
    imgs1 = jnp.asarray(imgs1_np)
    Hs = jnp.tile(jnp.eye(3)[None], (BATCH, 1, 1))
    sizes = jnp.full((BATCH, 2), float(SIZE))
    scales = jnp.full((BATCH,), float(SIZE))
    keys = jax.random.split(jax.random.key(0), BATCH)

    # round 5: the step supports the sparse-descriptor head (verdict item
    # 1) — time both protocols in ONE process (compile-helper overhead)
    modes = os.environ.get("R13_MODES", "sparse,dense").split(",")
    for mode in modes:
        sparse = mode.strip() == "sparse"
        md = jnp.bfloat16 if (
            sparse and os.environ.get("R13_PRECISION", "bfloat16")
            == "bfloat16") else None
        step = jax.jit(
            lambda a, b, H, Hi, sz, sc, k, s=sparse, m=md:
            batched_repeatability_step(model_fn, params, dp, a, b, H, Hi,
                                       sz, sc, k, sparse=s, match_dtype=m))
        out = step(imgs0, imgs1, Hs, Hs, sizes, scales, keys)
        jax.block_until_ready(out)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(imgs0, imgs1, Hs, Hs, sizes, scales, keys)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"DP eval step [{mode}]: batch {BATCH} pairs {SIZE}^2: "
              f"{dt * 1e3:.2f} ms -> {BATCH / dt:.1f} pairs/s/chip "
              f"({2 * BATCH / dt:.1f} frames/s/chip)", flush=True)


if __name__ == "__main__":
    main()
