"""End-to-end metric parity: our full pipeline vs the reference torch pipeline
(imported read-only from /root/reference with stub deps) on identical
synthetic image pairs and identical ALIKE-t weights. This is the golden-number
check of SURVEY.md §4 run on generated data: repeatability and mean error must
agree closely pair by pair."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "golden"))
    from make_golden import install_stubs
    install_stubs()
    sys.path.insert(0, REF)
    import torch
    from models.ALike import ALNet
    from utils.extracter import detection as ref_detection
    from tasks.repeatability import val_key_points as ref_val
    model = ALNet({"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64})
    model.load_state_dict(torch.load(f"{REF}/weights/alike-t.pth",
                                     map_location="cpu"))
    model.eval()
    return model, ref_detection, ref_val


def _ref_repeatability(model, ref_detection, ref_val, sample):
    import torch
    params = {"nms_dist": 6, "threshold": 0.0, "border_dist": 8,
              "top_k": 1000, "min_score": 0.0}
    img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
    img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
    with torch.no_grad():
        s0, _ = model(img0)
        s1, _ = model(img1)
    k0 = ref_detection(s0, params)
    k1 = ref_detection(s1, params)

    def to_t(wp):
        out = {}
        for k, v in wp.items():
            out[k] = torch.as_tensor(v) if isinstance(v, np.ndarray) else v
        return out

    res = ref_val(k0, k1, to_t(sample["warp01_params"]),
                  to_t(sample["warp10_params"]), th=3)
    return float(res["repeatability"]), float(res["mean_error"]), \
        int(res["num_feat"])


def _our_repeatability(sample):
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    class OneSample:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return sample

    cfg = EvalConfig(
        model_type="Alike", task_type="repeatability",
        data_params={"type": "synthetic_homography"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 1000, "min_score": 0.0},
        task_params={"th": 3}, output_dir="/tmp/kbt_parity")
    ev = Evaluator(cfg)
    return ev._run_repeatability(OneSample())


def test_mha_parity_vs_reference(reference_modules):
    """Full MHA chain on one synthetic pair: the reference path
    (torch detection + skimage-semantics BF + cv2.findHomography) and ours
    (masked BF + vectorized RANSAC) must produce the same hit vector on
    clean synthetic data."""
    import torch
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    model, ref_detection, _ = reference_modules
    sys.path.insert(0, REF)
    from tasks.MHA import mha as ref_mha

    ds = SyntheticHomographyDataset(num_pairs=2, image_size=256, seed=11)
    ep = {"nms_dist": 6, "threshold": 0.0, "border_dist": 8,
          "top_k": 1000, "min_score": 0.0}
    for i in range(len(ds)):
        sample = ds[i]
        img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, d0 = model(img0)
            s1, d1 = model(img1)

        def to_t(wp):
            return {k: (v if isinstance(v, str) else torch.as_tensor(v))
                    for k, v in wp.items()}

        ref_params = {
            "extractor_params": ep,
            "MHA_params": {"th": [3, 5, 7]},
            "matcher_params": {"brute_force_params": {
                "metric": "euclidean", "max_distance": 5.0,
                "cross_check": True}},
        }
        ref_hits = ref_mha(i, img0, s0, d0, img1, s1, d1,
                           to_t(sample["warp01_params"]),
                           to_t(sample["warp10_params"]), ref_params)

        class OneSample:
            def __len__(self):
                return 1

            def __getitem__(self, _):
                return sample

        cfg = EvalConfig(
            model_type="Alike", task_type="MHA",
            data_params={"type": "synthetic_homography"},
            extractor_params=ep,
            matcher_params={"type": "brute_force",
                            "brute_force_params": {"max_distance": 5.0}},
            task_params={"th": [3, 5, 7]}, output_dir="/tmp/kbt_parity_mha")
        ours = Evaluator(cfg)._run_mha(OneSample())["per_pair"][0]
        assert list(map(float, ref_hits)) == list(map(float, ours)), \
            (i, ref_hits, ours)


def test_fundamental_lk_parity_vs_reference(reference_modules):
    """FundamentalMatrix task with LK tracking on a synthetic sequence: the
    reference chain (torch OpticalFlow + epipolar error vs GT F) and ours
    must produce close error statistics. Both jitter LK init points randomly
    (the reference unseeded, torch side seeded here), so compare with
    statistical tolerance."""
    import torch
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticSequenceDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    model, ref_detection, _ = reference_modules
    sys.path.insert(0, REF)
    from tasks.FundamentalMatrix import fundamental_matrix as ref_fm

    n = 3
    ds = SyntheticSequenceDataset(n, 256, seed=2)
    ep = {"nms_dist": 6, "threshold": 0.0, "border_dist": 8,
          "top_k": 500, "min_score": 0.0}
    of = {"distance": 10, "win_size": 21, "levels": 3, "interation": 40,
          "gray": False}
    ref_params = {"extractor_params": ep, "model_type": "Alike",
                  "matcher_params": {"type": "optical_flow",
                                     "optical_flow_params": of},
                  "FundamentalMatrix_params": {"th": 3}}
    torch.manual_seed(0)
    ref_errs, ref_radios = [], []
    last = None
    for i in range(n):
        b = ds[i]
        if last is None:
            last = b
        img0 = torch.from_numpy(
            np.asarray(last["image0"]).transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(
            np.asarray(b["image0"]).transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, _ = model(img0)
            s1, _ = model(img1)
        batch = {"fundamental": torch.from_numpy(b["fundamental"])[None]}
        out = ref_fm(i, img0, batch, s0, s1, img0, img1, None, ref_params)
        ref_errs.append(float(out["fundamental_error"]))
        ref_radios.append(float(out["fundamental_radio"]))
        last = b

    cfg = EvalConfig(
        model_type="Alike", task_type="FundamentalMatrix",
        data_params={"type": "synthetic_sequence", "num_frames": n,
                     "image_size": 256, "seed": 2},
        extractor_params=ep,
        matcher_params={"type": "optical_flow", "optical_flow_params": of},
        task_params={"th": 3}, output_dir="/tmp/kbt_parity_fm")
    ours = Evaluator(cfg).run()
    ref_mean = float(np.mean(ref_errs))
    our_mean = ours["fundamental_error"]
    # LK init jitter differs between frameworks; the aggregate epipolar
    # error must land in the same regime
    assert abs(our_mean - ref_mean) < max(0.5, 0.5 * ref_mean), \
        (our_mean, ref_mean)
    assert abs(ours["fundamental_radio"] - np.mean(ref_radios)) < 0.2


def test_repeatability_parity_vs_reference(reference_modules):
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    model, ref_detection, ref_val = reference_modules
    ds = SyntheticHomographyDataset(num_pairs=3, image_size=256, seed=7)
    for i in range(len(ds)):
        sample = ds[i]
        ref_rep, ref_err, ref_nf = _ref_repeatability(
            model, ref_detection, ref_val, sample)
        ours = _our_repeatability(sample)
        our_rep = ours["per_pair_repeatability"][0]
        assert abs(our_rep - ref_rep) < 0.03, (i, our_rep, ref_rep)
        if np.isfinite(ref_err):
            assert abs(ours["rep_mean_err"] - ref_err) < 0.15, \
                (i, ours["rep_mean_err"], ref_err)
        assert abs(ours["num_feat"] - ref_nf) <= 5
