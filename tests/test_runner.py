"""End-to-end runner smoke tests on synthetic data (no external datasets)."""
import numpy as np
import pytest

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def _cfg(task, model="Alike", matcher="brute_force", data=None, **kw):
    return EvalConfig(
        model_type=model,
        task_type=task,
        data_params=data or {"type": "synthetic_homography", "num_pairs": 2,
                             "image_size": 256},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        matcher_params={"type": matcher,
                        "brute_force_params": {"max_distance": 5.0},
                        "optical_flow_params": {"distance": 10, "win_size": 21,
                                                "levels": 3,
                                                "interation": 40}},
        output_dir="/tmp/kbt_test_out",
        **kw)


def test_repeatability_e2e():
    res = Evaluator(_cfg("repeatability")).run()
    # a real detector on a mildly warped synthetic pair must be repeatable
    assert res["repeatability"] > 0.2, res
    assert 0 < res["rep_mean_err"] < 3.0


def test_mha_e2e():
    res = Evaluator(_cfg("MHA")).run()
    # homography is recoverable on synthetic texture
    assert res["MHA@7"] >= 0.5, res


def test_fundamental_e2e_optical_flow():
    res = Evaluator(_cfg(
        "FundamentalMatrix", matcher="optical_flow",
        data={"type": "synthetic_sequence", "num_frames": 4,
              "image_size": 256})).run()
    assert np.isfinite(res["fundamental_error"])
    # pure-translation sequence, LK-tracked: most points near their epipolar
    # lines
    assert res["fundamental_radio"] > 0.5, res


def test_vo_e2e():
    res = Evaluator(_cfg(
        "visual_odometer", matcher="optical_flow",
        data={"type": "synthetic_sequence", "num_frames": 5,
              "image_size": 256})).run()
    t = res["t_est"]
    assert t.shape[0] == 6
    # camera translates mostly along +x in the synthetic world
    assert abs(t[-1, 0, 0]) > abs(t[-1, 2, 0])


def test_tracking_error_e2e():
    res = Evaluator(_cfg("VisualizeTrackingError",
                         matcher="optical_flow")).run()
    assert np.isfinite(res["track_error"])
    assert res["track_error"] < 10.0  # LK re-finds warped points


def test_save_images_writes_debug_dumps(tmp_path):
    """Flag-gated per-pair debug dumps (reference save_result behavior,
    FundamentalMatrix.py:25-48/70-84, AUC.py:146-148) — off by default."""
    import os
    base = _cfg("MHA")
    base.output_dir = str(tmp_path / "off")
    Evaluator(base).run()
    assert not [f for f in os.listdir(base.output_dir)
                if f.endswith(".png")]

    on = _cfg("MHA", task_params={"save_images": True})
    on.output_dir = str(tmp_path / "mha")
    Evaluator(on).run()
    assert any(f.startswith("mha_matches_") for f in os.listdir(on.output_dir))

    fund = _cfg("FundamentalMatrix", matcher="optical_flow",
                data={"type": "synthetic_sequence", "num_frames": 3,
                      "image_size": 256},
                task_params={"save_images": True})
    fund.output_dir = str(tmp_path / "fund")
    Evaluator(fund).run()
    names = os.listdir(fund.output_dir)
    assert any(f.startswith("fund_matches_") for f in names)
    assert any(f.startswith("fund_epipolar_") for f in names)
