"""Runner light_glue matcher path end-to-end: golden randomized SuperPoint +
LightGlue weights staged into a weights_dir, full pipeline on synthetic
pairs."""
import os

import numpy as np
import pytest

from keypoint_bench_tpu.runner import EvalConfig, Evaluator

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def staged_weights(tmp_path_factory):
    sp = os.path.join(GOLDEN, "SuperPoint.npz")
    lg = os.path.join(GOLDEN, "lightglue.npz")
    if not (os.path.exists(sp) and os.path.exists(lg)):
        pytest.skip("golden fixtures missing")
    d = tmp_path_factory.mktemp("weights")
    g = np.load(sp)
    np.savez(d / "SuperPoint.npz",
             **{k[len("param:"):]: g[k] for k in g.files
                if k.startswith("param:")})
    g = np.load(lg)
    np.savez(d / "lightglue_superpoint.npz",
             **{k[len("param:"):]: g[k] for k in g.files
                if k.startswith("param:")})
    return str(d)


def _lg_cfg(weights_dir, out, extra_lg=None):
    lg = {"adaptive": False}
    lg.update(extra_lg or {})
    return EvalConfig(
        model_type="SuperPoint", task_type="FundamentalMatrixRansac",
        data_params={"type": "synthetic_se3", "num_pairs": 1,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 256, "min_score": 0.0},
        matcher_params={"type": "light_glue", "light_glue_params": lg},
        weights_dir=weights_dir, output_dir=out)


def test_lightglue_missing_weights_raises(tmp_path):
    """Requested light_glue with absent weights must raise, not silently
    run brute-force under the light_glue label (round-3 verdict)."""
    sp = os.path.join(GOLDEN, "SuperPoint.npz")
    if not os.path.exists(sp):
        pytest.skip("golden fixtures missing")
    d = tmp_path / "weights"
    d.mkdir()
    g = np.load(sp)
    np.savez(d / "SuperPoint.npz",
             **{k[len("param:"):]: g[k] for k in g.files
                if k.startswith("param:")})  # model only, NO lightglue npz
    with pytest.raises(RuntimeError, match="light_glue"):
        Evaluator(_lg_cfg(str(d), "/tmp/kbt_lg_missing"))


def test_lightglue_unsupported_model_raises(tmp_path):
    cfg = EvalConfig(
        model_type="LETNet", task_type="FundamentalMatrixRansac",
        data_params={"type": "synthetic_se3", "num_pairs": 1,
                     "image_size": 256},
        matcher_params={"type": "light_glue"},
        output_dir="/tmp/kbt_lg_unsupported")
    with pytest.raises(RuntimeError, match="adapter"):
        Evaluator(cfg)


def test_lightglue_missing_weights_optin_fallback(tmp_path):
    """allow_fallback: true runs brute-force with a warning and tags the
    results with matcher_fallback."""
    sp = os.path.join(GOLDEN, "SuperPoint.npz")
    if not os.path.exists(sp):
        pytest.skip("golden fixtures missing")
    d = tmp_path / "weights"
    d.mkdir()
    g = np.load(sp)
    np.savez(d / "SuperPoint.npz",
             **{k[len("param:"):]: g[k] for k in g.files
                if k.startswith("param:")})
    with pytest.warns(UserWarning, match="falling back"):
        ev = Evaluator(_lg_cfg(str(d), "/tmp/kbt_lg_fallback",
                               {"allow_fallback": True}))
    res = ev.run()
    assert res["matcher_fallback"] == "brute_force"


@pytest.mark.parametrize("adaptive", [False, True])
def test_lightglue_matcher_runner_path(staged_weights, adaptive):
    cfg = EvalConfig(
        model_type="SuperPoint", task_type="FundamentalMatrixRansac",
        data_params={"type": "synthetic_se3", "num_pairs": 1,
                     "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 256, "min_score": 0.0},
        matcher_params={"type": "light_glue",
                        "light_glue_params": {"adaptive": adaptive}},
        weights_dir=staged_weights,
        output_dir=f"/tmp/kbt_lg_runner_{adaptive}")
    ev = Evaluator(cfg)
    assert ev.lightglue_params is not None  # weights staged and found
    res = ev.run()
    # randomized LightGlue weights match poorly — the contract here is that
    # the full path (detect -> sample -> attention matcher -> RANSAC) runs
    # and produces finite, well-formed metrics
    assert 0.0 <= res["fundamental_radio"] <= 1.0
