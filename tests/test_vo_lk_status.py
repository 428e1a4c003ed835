"""Quantify the VO LK-status approximation (VERDICT r1 #10).

The reference filters LK tracks by cv2.calcOpticalFlowPyrLK `status`
(visual_odometer.py:44-47); the device path substitutes an in-bounds check.
Run both matchers (device LK + in-bounds vs host cv2 LK + status) through
the full VO task on the same synthetic sequence and compare trajectory ATE
against ground truth.
"""
import numpy as np

from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.tasks.trajectory import ate_rmse


def _vo(matcher, out):
    cfg = EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_sequence", "num_frames": 8,
                     "image_size": 256, "seed": 6},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        matcher_params={"type": matcher,
                        "optical_flow_params": {"distance": 10,
                                                "win_size": 21, "levels": 3,
                                                "interation": 40}},
        output_dir=out, seed=3)
    ev = Evaluator(cfg)
    ds = ev.cfg.data_params
    res = ev.run()
    from keypoint_bench_tpu.datasets import get_dataset
    gts = np.stack([np.asarray(get_dataset(ds)[i]["ground_truth"])[0:3, 3]
                    for i in range(8)])
    # chain: est[0] = I, est[1] = I (the (b0, b0) seed pair), est[k >= 1]
    # tracks frame k-1 -> frames 0..7 correspond to est[1:]
    t_est = np.asarray(res["t_est"]).reshape(-1, 3)[1:]
    return ate_rmse(t_est, gts)


def test_lk_status_ate_delta(tmp_path):
    ate_dev = _vo("optical_flow", str(tmp_path / "dev"))
    ate_cv = _vo("optical_flow_cv", str(tmp_path / "cv"))
    print(f"ATE device-LK+inbounds: {ate_dev:.4f}  cv2-LK+status: "
          f"{ate_cv:.4f}  delta: {abs(ate_dev - ate_cv):.4f}")
    assert np.isfinite(ate_dev) and np.isfinite(ate_cv)
    # the approximation must not degrade the trajectory materially: the
    # device path's ATE stays within 50% + 0.02 of the cv2-status path
    assert ate_dev <= 1.5 * ate_cv + 0.02, (ate_dev, ate_cv)
