"""Round-5: per-chip throughput of the sharded MHA and AUC protocol steps
(parallel/evaluate.sharded_mha_step / sharded_auc_step) on a 1-device mesh
at bench conditions — the numbers multi-chip DP claims multiply.

The AUC step runs the 4096-hypothesis essential RANSAC per pair, which
round 5 rebuilt on the fast manifold retraction (geometry/ransac.py
_essential_project_hyp — svd3 on the hypothesis batch was 90% of the VO
pair-solve); this records the protocol-step effect.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("R17_BATCH", "48"))
SIZE = int(os.environ.get("R17_SIZE", "512"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.models.common import cast_params_bf16
    from keypoint_bench_tpu.ops.detect import DetectParams
    from keypoint_bench_tpu.parallel.evaluate import (sharded_auc_step,
                                                      sharded_mha_step)
    from keypoint_bench_tpu.weights import load_params

    model_fn = get_model("Alike_s2d")
    params = cast_params_bf16(load_params("Alike_s2d"))
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    from keypoint_bench_tpu.datasets.synthetic import (SyntheticSE3Dataset,
                                                       _texture, _warp_image)
    rng = np.random.default_rng(0)

    # MHA: warped textured pairs + homographies
    imgs0, imgs1, Hs, Hinvs = [], [], [], []
    for i in range(BATCH):
        img0 = _texture(SIZE, SIZE, rng)
        ang = rng.uniform(-0.08, 0.08)
        sc = rng.uniform(0.95, 1.05)
        tx, ty = rng.uniform(-4, 4, 2)
        c, si = np.cos(ang) * sc, np.sin(ang) * sc
        T = np.array([[1, 0, SIZE / 2], [0, 1, SIZE / 2], [0, 0, 1]])
        R = np.array([[c, -si, tx], [si, c, ty], [0, 0, 1]])
        H = (T @ R @ np.linalg.inv(T)).astype("float32")
        imgs0.append(img0)
        imgs1.append(_warp_image(img0, np.linalg.inv(H)))
        Hs.append(H)
        Hinvs.append(np.linalg.inv(H).astype("float32"))
    imgs0 = jnp.asarray(np.stack(imgs0))
    imgs1 = jnp.asarray(np.stack(imgs1))
    Hs = jnp.asarray(np.stack(Hs))
    Hinvs = jnp.asarray(np.stack(Hinvs))
    sizes = jnp.tile(jnp.asarray([[SIZE * 1.0, SIZE * 1.0]]), (BATCH, 1))
    scales = jnp.ones((BATCH,))
    keys = jax.random.split(jax.random.key(0), BATCH)

    step = sharded_mha_step(mesh, model_fn, params, dp, sparse=True,
                            match_dtype=jnp.bfloat16)
    out = step(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(step(imgs0, imgs1, Hs, Hinvs, sizes, scales,
                                   keys))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"DP MHA step: batch {BATCH} {SIZE}^2: {BATCH / dt:.1f} "
          f"pairs/s/chip ({dt / BATCH * 1e3:.2f} ms/pair); "
          f"mha@3/5/7 = {np.asarray(jnp.mean(out, axis=0)).round(3)}")

    # AUC: SE3 splat pairs with intrinsics + GT pose
    ds = SyntheticSE3Dataset(num_pairs=BATCH, image_size=SIZE, n_blobs=2400)
    items = [ds[i] for i in range(BATCH)]
    a0 = jnp.asarray(np.stack([it["image0"] for it in items]))
    a1 = jnp.asarray(np.stack([it["image1"] for it in items]))
    Ks = jnp.asarray(np.stack(
        [it["warp01_params"]["intrinsics0"] for it in items]))
    poses01 = jnp.asarray(np.stack(
        [it["warp01_params"]["pose01"] for it in items]))

    astep = sharded_auc_step(mesh, model_fn, params, dp, sparse=True,
                             match_dtype=jnp.bfloat16)
    out = astep(a0, a1, Ks, Ks, poses01, keys)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(astep(a0, a1, Ks, Ks, poses01, keys))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    errs = np.asarray(out[0])
    print(f"DP AUC step: batch {BATCH} {SIZE}^2: {BATCH / dt:.1f} "
          f"pairs/s/chip ({dt / BATCH * 1e3:.2f} ms/pair); "
          f"median pose err {np.median(errs):.2f} deg")


if __name__ == "__main__":
    main()
