"""Pipelined (batched detect + vmapped pair solves) VO vs the sequential path:
same trajectory up to RANSAC sampling noise."""
import numpy as np

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def _cfg(pipelined, out, model="Alike", task_extra=None):
    return EvalConfig(
        model_type=model, task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence", "num_frames": 4,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": pipelined, **(task_extra or {})},
        output_dir=out, seed=0)


def test_pipelined_vo_matches_sequential():
    r_seq = Evaluator(_cfg(False, "/tmp/kbt_vop_a")).run()
    r_pipe = Evaluator(_cfg(True, "/tmp/kbt_vop_b")).run()
    a = r_seq["t_est"][-1, :, 0]
    b = r_pipe["t_est"][-1, :, 0]
    # identical data, different RANSAC draws: end positions agree to ~0.3
    # over a ~1m trajectory and the dominant (+x) direction matches
    assert np.linalg.norm(a - b) < 0.4, (a, b)
    assert abs(b[0]) > abs(b[2]) and abs(a[0]) > abs(a[2])


def test_pipelined_vo_sparse_desc_matches_dense():
    """Alike_s2d pipelined VO with the sparse-descriptor detection
    (no dense [H, W, 64] map) vs the dense-map path: the sampled
    descriptor values are parity-equal (ops/sparse_desc.py), so with the
    same seed the trajectories agree tightly."""
    r_dense = Evaluator(_cfg(True, "/tmp/kbt_vop_c", model="Alike_s2d",
                             task_extra={"sparse_desc": False})).run()
    r_sparse = Evaluator(_cfg(True, "/tmp/kbt_vop_d", model="Alike_s2d",
                              task_extra={"sparse_desc": True})).run()
    a = r_dense["t_est"][-1, :, 0]
    b = r_sparse["t_est"][-1, :, 0]
    assert np.linalg.norm(a - b) < 0.2, (a, b)
