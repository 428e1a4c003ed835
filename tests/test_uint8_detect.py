"""uint8 frame input to the detection stages (round 5): production video
frames decode as uint8; detect_many transfers them as-is (4x fewer tunnel
bytes) and normalizes on device (runner.Evaluator._to_float). Values must
match the host-side f32/255 path exactly (the cast+divide is the same
arithmetic either way)."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def _evaluator():
    cfg = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "synthetic_sequence", "num_frames": 2,
                     "image_size": 128},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 200, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True},
        output_dir="/tmp/kbt_u8_test")
    return Evaluator(cfg)


def test_detect_many_uint8_equals_host_f32():
    rng = np.random.default_rng(0)
    u8 = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
          for _ in range(3)]
    f32 = [im.astype(np.float32) / 255.0 for im in u8]
    ev = _evaluator()
    for sparse in (False, True):
        sa, da, ka, va = ev.detect_many(u8, sparse=sparse)
        sb, db, kb, vb = ev.detect_many(f32, sparse=sparse)
        # device u8->f32/255 fuses into the first conv, so values differ
        # from the host-f32 path by float rounding (~1 ulp), not exactly
        assert np.allclose(np.asarray(sa), np.asarray(sb),
                           rtol=1e-4, atol=1e-6)
        assert np.array_equal(np.asarray(va), np.asarray(vb))
        # keypoints: ulp score changes may flip rare near-ties in NMS/topk;
        # require near-total agreement
        same = np.all(np.isclose(np.asarray(ka), np.asarray(kb),
                                 atol=1e-5), axis=-1)
        assert same.mean() > 0.98, same.mean()
        if da is not None and sparse:
            # per-keypoint descriptors follow keypoint agreement
            assert np.allclose(np.asarray(da)[same], np.asarray(db)[same],
                               rtol=1e-3, atol=1e-5)
        elif da is not None:
            # dense descriptor maps compare directly
            assert np.allclose(np.asarray(da), np.asarray(db),
                               rtol=1e-3, atol=1e-5)


def test_vo_pipelined_accepts_uint8_frames():
    # dataset items converted to uint8 (the bench_vo production layout)
    # run end-to-end through the pipelined VO path
    from keypoint_bench_tpu.datasets.registry import (get_dataset,
                                                      register_preloaded)
    base = get_dataset({"type": "synthetic_sequence", "num_frames": 4,
                        "image_size": 128})
    items = []
    for i in range(len(base)):
        it = dict(base[i])
        it["image0"] = (np.clip(it["image0"], 0.0, 1.0) * 255.0
                        + 0.5).astype(np.uint8)
        items.append(it)
    register_preloaded("u8_vo_test", items)
    cfg = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "preloaded", "name": "u8_vo_test"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 200, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True},
        output_dir="/tmp/kbt_u8_vo_test")
    res = Evaluator(cfg).run()
    assert res["num_frames"] == 4
    assert np.isfinite(res["t_est"]).all()
