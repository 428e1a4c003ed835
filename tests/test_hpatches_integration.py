"""HPatches loader -> full repeatability pipeline integration on a generated
PPM dataset (exercises the real dataset code path end-to-end without the
actual HPatches download)."""
import os

import numpy as np
import pytest

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def _write_ppm(path, img_u8):
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


@pytest.fixture(scope="module")
def fake_hpatches(tmp_path_factory):
    from keypoint_bench_tpu.datasets.synthetic import (_texture, _warp_image)
    root = tmp_path_factory.mktemp("hp")
    rng = np.random.default_rng(0)
    for name in ("v_one", "i_two"):
        d = root / name
        d.mkdir()
        base = _texture(240, 320, rng)
        _write_ppm(str(d / "1.ppm"), (base * 255).astype(np.uint8))
        H = np.eye(3, dtype=np.float64)
        H[0, 2] = 8.0
        warped = _warp_image(base, np.linalg.inv(H))
        _write_ppm(str(d / "2.ppm"), (warped * 255).astype(np.uint8))
        np.savetxt(str(d / "H_1_2"), H)
    return str(root)


def test_hpatches_repeatability_pipeline(fake_hpatches):
    cfg = EvalConfig(
        model_type="Alike", task_type="repeatability",
        data_params={"type": "hpatches", "root": fake_hpatches,
                     "alteration": "all", "image_size": 256},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 300, "min_score": 0.0},
        task_params={"th": 3}, output_dir="/tmp/kbt_hp_int")
    res = Evaluator(cfg).run()
    # an 8px shift of the same texture: keypoints must re-detect strongly
    assert res["repeatability"] > 0.4, res
    assert res["rep_mean_err"] < 3.0


def test_hpatches_alteration_filter(fake_hpatches):
    from keypoint_bench_tpu.datasets.pairs import HPatchesDataset
    assert len(HPatchesDataset(fake_hpatches, "v", 128)) == 1
    assert len(HPatchesDataset(fake_hpatches, "i", 128)) == 1
    assert len(HPatchesDataset(fake_hpatches, "all", 128)) == 2
