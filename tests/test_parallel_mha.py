"""Sharded batched MHA equals the per-pair runner path on the 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.datasets.synthetic import SyntheticHomographyDataset
from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.ops.detect import DetectParams
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.evaluate import sharded_mha_step
from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.weights import load_params


def test_sharded_mha_matches_runner():
    n = 8
    ds = SyntheticHomographyDataset(n, 128, seed=5)
    dp = DetectParams(nms_dist=4, border_dist=8, top_k=200)
    mesh = make_mesh(n_data=8)
    step = sharded_mha_step(mesh, get_model("Alike"), load_params("Alike"),
                            dp)
    samples = [ds[i] for i in range(n)]
    imgs0 = jnp.stack([jnp.asarray(s["image0"]) for s in samples])
    imgs1 = jnp.stack([jnp.asarray(s["image1"]) for s in samples])
    Hs = jnp.stack([jnp.asarray(s["warp01_params"]["homography_matrix"])
                    for s in samples])
    Hinvs = jnp.stack([jnp.asarray(s["warp10_params"]["homography_matrix"])
                       for s in samples])
    sizes = jnp.stack([jnp.asarray([float(s["warp01_params"]["width"]),
                                    float(s["warp01_params"]["height"])])
                       for s in samples])
    scales = jnp.asarray([float(s["warp01_params"]["resize"])
                          for s in samples])
    keys = jax.random.split(jax.random.key(0), n)
    with mesh:
        hits = np.asarray(step(imgs0, imgs1, Hs, Hinvs, sizes, scales,
                               keys)).mean(axis=0)

    cfg = EvalConfig(
        model_type="Alike", task_type="MHA",
        data_params={"type": "synthetic_homography", "num_pairs": n,
                     "image_size": 128, "seed": 5},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 200, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"th": [3, 5, 7]}, output_dir="/tmp/kbt_mha_shard")
    res = Evaluator(cfg).run()
    ref = np.array([res["MHA@3"], res["MHA@5"], res["MHA@7"]])
    # RANSAC draws differ (independent keys) but on clean synthetic pairs
    # homographies are recovered identically -> same hit rates within one
    # pair's worth of wiggle
    assert np.abs(hits - ref).max() <= 1.0 / n + 1e-6, (hits, ref)
