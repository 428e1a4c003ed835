"""VO -> windowed bundle adjustment: track chaining, triangulation, and LM
refinement reduce reprojection error on the splat sequence."""
import numpy as np

from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.tasks.vo_ba import chain_tracks


def test_chain_tracks():
    # two pairs; slot 0 tracks through all 3 frames, slot 1 only pair 1
    idx = np.array([[0, 0], [0, 1], [0, 0]])
    ok = np.array([[False, False], [True, True], [True, False]])
    tracks = chain_tracks(idx, ok)
    lens = sorted(len(t) for t in tracks)
    assert lens == [2, 3], tracks
    t3 = max(tracks, key=len)
    assert t3 == [(0, 0), (1, 0), (2, 0)]


def test_vo_ba_refinement_reduces_reprojection():
    cfg = EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence", "num_frames": 5,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True, "ba_refine": True},
        output_dir="/tmp/kbt_vo_ba_test", seed=0)
    res = Evaluator(cfg).run()
    assert res["ba_tracks"] > 100
    assert np.isfinite(res["ba_reproj_after"])
    assert res["ba_reproj_after"] < res["ba_reproj_before"]
    # refined points live at sane depths in front of the first camera
    pts = res["ba_points"]
    z0 = (res["ba_R_w2c"][0] @ pts.T + res["ba_t_w2c"][0][:, None])[2]
    assert (z0 > 0).mean() > 0.95
