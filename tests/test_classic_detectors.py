"""FAST (ORB) and DoG (SIFT) classic detectors."""
import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models import get_model


def test_fast_agrees_with_cv2():
    import cv2
    rng = np.random.default_rng(0)
    img = (rng.random((96, 128)) * 0.2).astype(np.float32)
    # plant strong corners
    for (r, c) in [(20, 30), (50, 80), (70, 40)]:
        img[r:r + 6, c:c + 6] = 1.0
    rgb = np.repeat(img[..., None], 3, axis=2)
    score, desc = get_model("ORB")({}, jnp.asarray(rgb[None]))
    assert desc is None
    score = np.asarray(score)[0, ..., 0]

    det = cv2.FastFeatureDetector_create(threshold=10, nonmaxSuppression=False)
    kps = det.detect((img * 255).astype(np.uint8), None)
    cv_mask = np.zeros_like(img, bool)
    for kp in kps:
        cv_mask[int(kp.pt[1]), int(kp.pt[0])] = True
    ours_mask = score > 0
    if cv_mask.sum():
        # the overwhelming majority of cv2 FAST corners must score > 0 for us
        agree = (ours_mask & cv_mask).sum() / cv_mask.sum()
        assert agree > 0.9, agree


def test_dog_finds_blobs():
    img = np.zeros((96, 96), np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    for (r, c) in [(30, 30), (60, 70)]:
        img += np.exp(-((yy - r) ** 2 + (xx - c) ** 2) / (2 * 3.0 ** 2))
    rgb = np.repeat(img[..., None], 3, axis=2)
    score, desc = get_model("SIFT")({}, jnp.asarray(rgb[None]))
    score = np.asarray(score)[0, ..., 0]
    assert desc is None
    for (r, c) in [(30, 30), (60, 70)]:
        patch = score[r - 3: r + 4, c - 3: c + 4]
        assert patch.max() > 0, (r, c)
        # response concentrates near the blob centres
    far = score.copy()
    far[20:40, 20:40] = 0
    far[50:70, 60:80] = 0
    assert far.max() <= score.max()


def test_orb_repeatability_e2e():
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator
    cfg = EvalConfig(
        model_type="ORB", task_type="repeatability",
        data_params={"type": "synthetic_homography", "num_pairs": 1,
                     "image_size": 128},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 200, "min_score": 0.0},
        task_params={"th": 3}, output_dir="/tmp/kbt_orb")
    res = Evaluator(cfg).run()
    assert res["repeatability"] > 0.1
