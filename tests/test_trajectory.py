"""ATE evaluation + VO-end-to-end trajectory quality on synthetic sequences."""
import numpy as np

from keypoint_bench_tpu.tasks.trajectory import (ate_rmse, umeyama_align,
                                                 read_kitti_trajectory)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    gt = rng.normal(0, 2, (30, 3))
    import cv2
    R, _ = cv2.Rodrigues(np.array([0.1, -0.2, 0.3]))
    est = ((gt - np.array([1, 2, 3])) @ R) / 1.7  # inverse similarity
    assert ate_rmse(est, gt) < 1e-6
    assert ate_rmse(est, gt, align=False) > 1.0


def test_vo_trajectory_ate():
    """Full VO on the synthetic sequence, scored with aligned ATE."""
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator
    n = 6
    cfg = EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        matcher_params={"type": "optical_flow",
                        "optical_flow_params": {"distance": 5, "win_size": 21,
                                                "levels": 3,
                                                "interation": 40}},
        data_params={"type": "synthetic_sequence", "num_frames": n,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        output_dir="/tmp/kbt_vo_ate")
    res = Evaluator(cfg).run()
    # GT camera positions: world-from-cam translations of the synthetic poses
    from keypoint_bench_tpu.datasets.synthetic import SyntheticSequenceDataset
    ds = SyntheticSequenceDataset(n, 256)
    gt = np.stack([p[:3, 3] for p in ds.poses])
    est = res["t_est"][1:, :, 0]  # drop the leading identity
    ate = ate_rmse(est, gt)
    # the synthetic motion spans ~0.4m; VO should track it well under ATE
    assert ate < 0.1, ate
    # trajectory file round-trip
    R2, t2 = read_kitti_trajectory(res["trajectory_path"])
    assert R2.shape[0] == n + 1
