"""bf16 fast path: metric shift vs f32 must stay negligible."""
from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def test_bf16_metric_shift_small():
    base = dict(
        model_type="Alike", task_type="repeatability",
        data_params={"type": "synthetic_homography", "num_pairs": 2,
                     "image_size": 256},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        task_params={"th": 3}, output_dir="/tmp/kbt_p32")
    r32 = Evaluator(EvalConfig.from_dict(base)).run()
    base["precision"] = "bfloat16"
    base["output_dir"] = "/tmp/kbt_p16"
    r16 = Evaluator(EvalConfig.from_dict(base)).run()
    assert abs(r32["repeatability"] - r16["repeatability"]) < 0.02
    assert abs(r32["rep_mean_err"] - r16["rep_mean_err"]) < 0.05
