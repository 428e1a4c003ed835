"""Sharded batched AUC (parallel/evaluate.sharded_auc_step).

Essential-matrix pose angles on the splat scenes are key-chaotic (small
rotations, blob descriptors -> outlier-heavy matches), so tests assert the
stable quantities: the batched step runs sharded over the 8-device mesh,
produces valid errors for every pair, and finds consensus sets of the same
size as the per-pair path. Detection/match parity under vmap is covered by
test_parallel.py; pose-solver accuracy by test_ransac.py/test_fivepoint.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.datasets.synthetic import SyntheticSE3Dataset
from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.ops.detect import DetectParams
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.evaluate import sharded_auc_step
from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.weights import load_params


def test_sharded_auc_step_runs_on_mesh():
    n = 8
    ds = SyntheticSE3Dataset(n, 256)
    samples = [ds[i] for i in range(n)]
    imgs0 = jnp.stack([jnp.asarray(s["image0"], jnp.float32) for s in samples])
    imgs1 = jnp.stack([jnp.asarray(s["image1"], jnp.float32) for s in samples])
    K0s = jnp.stack([jnp.asarray(s["warp01_params"]["intrinsics0"])
                     for s in samples])
    K1s = jnp.stack([jnp.asarray(s["warp01_params"]["intrinsics1"])
                     for s in samples])
    poses = jnp.stack([jnp.asarray(s["warp01_params"]["pose01"])
                       for s in samples])
    keys = jax.random.split(jax.random.key(0), n)
    dp = DetectParams(nms_dist=4, border_dist=8, top_k=500)
    mesh = make_mesh(n_data=8)
    step = sharded_auc_step(mesh, get_model("Alike"), load_params("Alike"),
                            dp, n_hyp=2048)
    with mesh:
        errs, inl = step(imgs0, imgs1, K0s, K1s, poses, keys)
    errs, inl = np.asarray(errs), np.asarray(inl)
    assert errs.shape == (n,) and inl.shape == (n,)
    assert np.all(np.isfinite(errs)) and np.all(errs >= 0) \
        and np.all(errs <= 180)
    # every pair has a real consensus set (scenes have ~100+ true matches)
    assert np.all(inl > 30), inl
    # most poses land: the batch isn't garbage even if single pairs wobble
    assert np.median(errs) < 90.0, errs


def _cfg(batch_size, solver="8pt", n=8):
    data = {"type": "synthetic_se3", "num_pairs": n, "image_size": 256}
    if batch_size > 1:
        data["batch_size"] = batch_size
    return EvalConfig(
        model_type="Alike", task_type="AUC",
        data_params=data,
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"th": [5, 10, 20], "solver": solver},
        output_dir=f"/tmp/kbt_auc_shard_{batch_size}_{solver}_{n}")


def test_sharded_auc_evaluator_tail_fallback():
    """7 pairs with batch_size 4 -> one sharded batch + 3 per-pair tail;
    every pair contributes an error and inlier consensus stays comparable
    to the per-pair path (pose angles themselves are key-chaotic here)."""
    res_b = Evaluator(_cfg(4, n=7)).run()
    res_1 = Evaluator(_cfg(1, n=7)).run()
    assert len(res_b["per_pair_error"]) == 7
    assert len(res_1["per_pair_error"]) == 7
    assert res_b["AUC_inliers"] > 0.6 * res_1["AUC_inliers"], \
        (res_b["AUC_inliers"], res_1["AUC_inliers"])


def test_sharded_auc_5pt_solver():
    res = Evaluator(_cfg(4, solver="5pt", n=4)).run()
    assert len(res["per_pair_error"]) == 4
    assert all(0 <= e <= 180 for e in res["per_pair_error"])
    assert res["AUC_inliers"] > 30
