"""Export (XLA AOT), profiling, visualization, and sweep utilities."""
import os

import numpy as np
import jax.numpy as jnp
import pytest


def test_export_roundtrip(tmp_path):
    from keypoint_bench_tpu.utils.export import export_model, load_exported
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.weights import load_params

    path = export_model("LETNet", str(tmp_path / "letnet.stablehlo"),
                        input_shape=(1, 64, 64, 3))
    assert os.path.getsize(path) > 1000
    call = load_exported(path)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    score_e, desc_e = call(img)
    score_d, desc_d = get_model("LETNet")(load_params("LETNet"), img)
    np.testing.assert_allclose(np.asarray(score_e), np.asarray(score_d),
                               atol=1e-5)


def test_model_cost():
    from keypoint_bench_tpu.utils.profiling import model_cost
    cost = model_cost("Alike", input_shape=(1, 64, 64, 3))
    assert cost["gflops"] > 0.01
    assert cost["params_k"] > 50  # alike-t has ~85k params


def test_visualization_outputs():
    from keypoint_bench_tpu.utils import visualization as vz
    rng = np.random.default_rng(0)
    img = rng.random((64, 80, 3)).astype(np.float32)
    kpts = rng.random((10, 3)).astype(np.float32)
    show = vz.plot_kps_error(img, kpts, errors=rng.random(10) * 3)
    assert show.shape == (64, 80, 3) and show.dtype == np.uint8
    pts_px = rng.uniform(0, 60, (10, 2))
    m = vz.plot_matches(img, img, pts_px, pts_px)
    assert m.shape == (64, 160, 3)
    F = np.eye(3)
    e = vz.plot_epipolar_lines(img, pts_px, pts_px, F)
    assert e.shape == (64, 80, 3)


def test_sweep_two_models(tmp_path):
    from keypoint_bench_tpu.sweep import run_sweep
    base = {
        "model_type": "Alike",
        "task_type": "repeatability",
        "data_params": {"type": "synthetic_homography", "num_pairs": 1,
                        "image_size": 128},
        "extractor_params": {"nms_dist": 4, "threshold": 0, "border_dist": 8,
                             "top_k": 200, "min_score": 0.0},
        "task_params": {"th": 3},
        "output_dir": str(tmp_path),
    }
    res = run_sweep(base, models=["Alike", "Harris"])
    assert set(res) == {"Alike", "Harris"}
    for v in res.values():
        assert "repeatability" in v
