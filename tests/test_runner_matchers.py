"""Matcher-variant coverage for sequence tasks: VO/FM with brute-force and
the FundamentalMatrixRansac task end-to-end."""
import numpy as np

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def _seq_cfg(task, matcher):
    return EvalConfig(
        model_type="Alike", task_type=task,
        data_params={"type": "synthetic_sequence", "num_frames": 4,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": matcher,
                        "brute_force_params": {"max_distance": 5.0},
                        "optical_flow_params": {"distance": 5, "win_size": 21,
                                                "levels": 3,
                                                "interation": 40}},
        output_dir=f"/tmp/kbt_m_{task}_{matcher}")


def test_fundamental_brute_force():
    res = Evaluator(_seq_cfg("FundamentalMatrix", "brute_force")).run()
    assert np.isfinite(res["fundamental_error"])
    assert res["fundamental_radio"] > 0.5, res


def test_vo_brute_force():
    # the 3D splat sequence: non-planar, so essential estimation from sparse
    # BF matches is well-posed (the single-plane synthetic_sequence is
    # degenerate for monocular E)
    cfg = _seq_cfg("visual_odometer", "brute_force")
    cfg.data_params = {"type": "synthetic_splat_sequence", "num_frames": 4,
                       "image_size": 256}
    res = Evaluator(cfg).run()
    t = res["t_est"]
    assert t.shape[0] == 5
    assert abs(t[-1, 0, 0]) > abs(t[-1, 2, 0])  # mostly-x translation


def test_fundamental_ransac_pairs():
    cfg = EvalConfig(
        model_type="Alike", task_type="FundamentalMatrixRansac",
        data_params={"type": "synthetic_se3", "num_pairs": 2,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        output_dir="/tmp/kbt_fmr")
    res = Evaluator(cfg).run()
    assert 0.0 < res["fundamental_radio"] <= 1.0