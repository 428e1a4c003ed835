"""Pipelined (batched) FundamentalMatrix equals the sequential path for both
matchers."""
import numpy as np
import pytest

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


@pytest.mark.parametrize("matcher", ["optical_flow", "brute_force"])
def test_pipelined_fm_matches_sequential(matcher):
    def cfg(pipelined, out):
        return EvalConfig(
            model_type="Alike", task_type="FundamentalMatrix",
            data_params={"type": "synthetic_sequence", "num_frames": 4,
                         "image_size": 256},
            extractor_params={"nms_dist": 4, "threshold": 0,
                              "border_dist": 8, "top_k": 300,
                              "min_score": 0.0},
            matcher_params={"type": matcher,
                            "brute_force_params": {"max_distance": 5.0},
                            "optical_flow_params": {"distance": 5,
                                                    "win_size": 21,
                                                    "levels": 3,
                                                    "interation": 40}},
            task_params={"th": 3, "pipelined": pipelined},
            output_dir=out, seed=0)

    r_seq = Evaluator(cfg(False, f"/tmp/kbt_fmp_a_{matcher}")).run()
    r_pipe = Evaluator(cfg(True, f"/tmp/kbt_fmp_b_{matcher}")).run()
    assert abs(r_seq["fundamental_error"]
               - r_pipe["fundamental_error"]) < 1e-3
    assert abs(r_seq["fundamental_radio"]
               - r_pipe["fundamental_radio"]) < 1e-6
