"""AUC task end-to-end on the 3D gaussian-splat synthetic SE3 dataset:
detect -> match -> essential RANSAC -> recoverPose must recover the GT
relative pose within a few degrees."""
import numpy as np
import pytest

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def test_auc_e2e_recovers_pose():
    cfg = EvalConfig(
        model_type="Alike", task_type="AUC",
        data_params={"type": "synthetic_se3", "num_pairs": 3,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"th": [5, 10, 20]},
        output_dir="/tmp/kbt_auc_e2e")
    res = Evaluator(cfg).run()
    errs = res["per_pair_error"]
    assert len(errs) == 3
    # rendered blob scenes with real parallax: pose errors small
    assert np.median(errs) < 10.0, errs
    assert res["AUC@20"] > 0.3, res


def test_auc_e2e_repeatability_se3_warp():
    """The SE3 warp path (depth interpolation, occlusion check) also works
    for the repeatability task on the splat scene."""
    cfg = EvalConfig(
        model_type="Alike", task_type="repeatability",
        data_params={"type": "synthetic_se3", "num_pairs": 2,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        task_params={"th": 3},
        output_dir="/tmp/kbt_rep_se3")
    res = Evaluator(cfg).run()
    assert res["repeatability"] > 0.1, res
