"""Extended end-to-end metric parity vs the reference torch pipeline
(imported read-only from /root/reference), broadening test_metric_parity.py:

- AUC: the full reference chain (torch detection + skimage-semantics BF +
  cv2.findEssentialMat/recoverPose, reference tasks/AUC.py:101-155) vs our
  AUC task on identical synthetic SE3 splat pairs.
- VO: the reference visual_odometry step loop (tasks/visual_odometer.py:10-96)
  vs our visual_odometer task on an identical synthetic splat sequence.
- Repeatability across more model families: KeyNet + r2d2 (real reference
  checkpoints) and SuperPoint + DISK (randomized weights rebuilt from the
  golden-fixture seeds, tests/golden/make_golden.py).
- MHA for the descriptor models of that set (r2d2, SuperPoint, DISK).
"""
import os
import sys
import tempfile

import numpy as np
import pytest

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_env():
    sys.path.insert(0, os.path.join(HERE, "golden"))
    from make_golden import install_stubs
    install_stubs()
    sys.path.insert(0, REF)
    from utils.extracter import detection as ref_detection
    return ref_detection


EP = {"nms_dist": 6, "threshold": 0.0, "border_dist": 8,
      "top_k": 500, "min_score": 0.0}
BF = {"metric": "euclidean", "max_distance": 5.0, "cross_check": True}


def _build_ref_model(name):
    """Reference torch model with the same weights our converted params use:
    real checkpoints for KeyNet/r2d2, the golden-fixture randomize() seeds
    for the blob-missing SuperPoint/DISK (make_golden.py)."""
    import torch
    from make_golden import randomize
    if name == "KeyNet":
        from models.KeyNet import KeyNet
        m = KeyNet({"num_filters": 8, "num_levels": 3, "kernel_size": 5})
        ck = torch.load(f"{REF}/weights/keynet_pytorch.pth",
                        map_location="cpu")
        m.load_state_dict(ck["state_dict"])
    elif name == "r2d2":
        ck = torch.load(f"{REF}/weights/r2d2_WASF_N16.pt", map_location="cpu")
        from models import r2d2 as r2d2mod
        m = eval(ck["net"], vars(r2d2mod))
        m.load_state_dict({k.replace("module.", ""): v
                           for k, v in ck["state_dict"].items()})
    elif name == "SuperPoint":
        from models.SuperPoint import SuperPointNet
        m = randomize(SuperPointNet(), 10)
    elif name == "DISK":
        from models.disk import DISK
        m = randomize(DISK(), 12)
    else:
        raise KeyError(name)
    m.eval()
    return m


def _our_weights_dir(name):
    """weights_npz has converted real checkpoints for KeyNet/r2d2; for the
    randomized models the converted params live inside the golden fixture —
    stage them into a temp weights dir the Evaluator can load."""
    if name in ("KeyNet", "r2d2"):
        return None
    g = np.load(os.path.join(HERE, "golden", f"{name}.npz"))
    params = {k[len("param:"):]: g[k] for k in g.files
              if k.startswith("param:")}
    assert params, f"golden fixture for {name} has no params"
    d = tempfile.mkdtemp(prefix=f"kbt_w_{name}_")
    np.savez(os.path.join(d, f"{name}.npz"), **params)
    return d


def _one_sample_ds(sample):
    class OneSample:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return sample
    return OneSample()


def _torch_warp(wp):
    import torch
    return {k: (v if isinstance(v, str)
                else torch.as_tensor(np.asarray(v)))
            for k, v in wp.items()}


@pytest.mark.parametrize("name", ["KeyNet", "r2d2", "SuperPoint", "DISK"])
def test_repeatability_parity_more_models(ref_env, name):
    import torch
    from tasks.repeatability import val_key_points as ref_val
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    ref_detection = ref_env
    model = _build_ref_model(name)
    wdir = _our_weights_dir(name)
    ds = SyntheticHomographyDataset(num_pairs=2, image_size=256, seed=5)
    params = dict(EP)
    for i in range(len(ds)):
        sample = ds[i]
        img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, _ = model(img0)
            s1, _ = model(img1)
        k0 = ref_detection(s0, params)
        k1 = ref_detection(s1, params)
        res = ref_val(k0, k1, _torch_warp(sample["warp01_params"]),
                      _torch_warp(sample["warp10_params"]), th=3)
        ref_rep = float(res["repeatability"])
        ref_nf = int(res["num_feat"])

        cfg = EvalConfig(
            model_type=name, task_type="repeatability",
            data_params={"type": "synthetic_homography"},
            extractor_params=EP, task_params={"th": 3},
            weights_dir=wdir,
            output_dir=f"/tmp/kbt_parity_rep_{name}")
        ours = Evaluator(cfg)._run_repeatability(_one_sample_ds(sample))
        our_rep = ours["per_pair_repeatability"][0]
        # randomized-weight nets amplify fp noise through exploded
        # activations; allow a slightly wider band than the Alike test
        assert abs(our_rep - ref_rep) < 0.06, (name, i, our_rep, ref_rep)
        assert abs(ours["num_feat"] - ref_nf) <= 10, \
            (name, i, ours["num_feat"], ref_nf)


@pytest.mark.parametrize("name", ["r2d2", "DISK"])
def test_mha_parity_more_models(ref_env, name):
    import torch
    from tasks.MHA import mha as ref_mha
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    model = _build_ref_model(name)
    wdir = _our_weights_dir(name)
    ds = SyntheticHomographyDataset(num_pairs=2, image_size=256, seed=9)
    for i in range(len(ds)):
        sample = ds[i]
        img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, d0 = model(img0)
            s1, d1 = model(img1)
        ref_params = {
            "extractor_params": EP,
            "MHA_params": {"th": [3, 5, 7]},
            "matcher_params": {"brute_force_params": dict(BF)},
        }
        ref_hits = ref_mha(i, img0, s0, d0, img1, s1, d1,
                           _torch_warp(sample["warp01_params"]),
                           _torch_warp(sample["warp10_params"]), ref_params)

        cfg = EvalConfig(
            model_type=name, task_type="MHA",
            data_params={"type": "synthetic_homography"},
            extractor_params=EP,
            matcher_params={"type": "brute_force",
                            "brute_force_params": {"max_distance": 5.0}},
            task_params={"th": [3, 5, 7]}, weights_dir=wdir,
            output_dir=f"/tmp/kbt_parity_mha_{name}")
        ours = Evaluator(cfg)._run_mha(_one_sample_ds(sample))["per_pair"][0]
        assert list(map(float, ref_hits)) == list(map(float, ours)), \
            (name, i, ref_hits, ours)


def test_superpoint_match_parity(ref_env):
    """SuperPoint's 1/8-resolution descriptor map exercises the desc_scale
    sampling path; with randomized weights the softmax saturates to a binary
    score map (~1024 tied 1.0 scores), so any top_k below that count selects
    a tie-broken subset and the downstream RANSAC hits are meaningless —
    parity is asserted on the deterministic part of the MHA chain instead:
    with top_k above the saturation count, the detected sets and mutual-NN
    match sets (reference utils/matcher.py:206-234 vs ops/matching.py) must
    coincide exactly."""
    import torch
    from utils.matcher import brute_force_matcher as ref_bf
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    ref_detection = ref_env
    model = _build_ref_model("SuperPoint")
    wdir = _our_weights_dir("SuperPoint")
    ds = SyntheticHomographyDataset(num_pairs=2, image_size=256, seed=9)
    ep = dict(EP, top_k=1500)
    cfg = EvalConfig(
        model_type="SuperPoint", task_type="MHA",
        data_params={"type": "synthetic_homography"},
        extractor_params=ep,
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        weights_dir=wdir, output_dir="/tmp/kbt_parity_spmatch")
    ev = Evaluator(cfg)
    for i in range(len(ds)):
        sample = ds[i]
        img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, d0 = model(img0)
            s1, d1 = model(img1)
        rk0 = ref_detection(s0, ep)
        rk1 = ref_detection(s1, ep)
        rp0, rp1 = ref_bf(rk0, rk1, d0, d1, dict(BF))
        ref_set = np.concatenate([rp0[:, :2].numpy(), rp1[:, :2].numpy()],
                                 axis=1)

        _, od0, k0, v0 = ev.detect(np.asarray(sample["image0"], np.float32))
        _, od1, k1, v1 = ev.detect(np.asarray(sample["image1"], np.float32))
        m0, m1, ok = ev._match(k0, v0, k1, v1, od0, od1, 256, 256)
        ok = np.asarray(ok)
        our_set = np.concatenate([np.asarray(m0)[ok][:, :2],
                                  np.asarray(m1)[ok][:, :2]], axis=1)

        assert len(our_set) == len(ref_set), \
            (i, len(our_set), len(ref_set))
        d = np.linalg.norm(ref_set[:, None] - our_set[None], axis=2)
        reproduced = (d.min(axis=1) < 1e-3).mean()
        # allow a stray NN flip from fp noise through the exploded
        # randomized activations
        assert reproduced >= 0.99, (i, reproduced, len(ref_set))


def test_auc_parity_vs_reference(ref_env, tmp_path):
    """Reference AUC chain (tasks/AUC.py:101-155: detection + BF matching +
    cv2 essential RANSAC + recoverPose + max(err_t, err_R)) vs our AUC task
    on the same synthetic SE3 splat pairs and ALIKE-t weights. RANSAC draws
    differ (cv2 vs ours), so per-pair pose errors agree in regime, and the
    aggregated pose_auc curves must agree closely."""
    import torch
    from models.ALike import ALNet
    from tasks.AUC import auc as ref_auc, pose_auc as ref_pose_auc
    from keypoint_bench_tpu.datasets.synthetic import SyntheticSE3Dataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    model = ALNet({"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64})
    model.load_state_dict(torch.load(f"{REF}/weights/alike-t.pth",
                                     map_location="cpu"))
    model.eval()

    n = 4
    ds = SyntheticSE3Dataset(num_pairs=n, image_size=256, seed=3)
    ep = dict(EP, top_k=1000)
    ref_params = {
        "extractor_params": ep,
        "matcher_params": {"brute_force_params": dict(BF)},
        "AUC_params": {"output": str(tmp_path)},
    }
    ref_errs = []
    for i in range(n):
        sample = ds[i]
        img0 = torch.from_numpy(sample["image0"].transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(sample["image1"].transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, d0 = model(img0)
            s1, d1 = model(img1)
        out = ref_auc(i, img0, s0, d0, img1, s1, d1,
                      _torch_warp(sample["warp01_params"]),
                      _torch_warp(sample["warp10_params"]), ref_params)
        ref_errs.append(float(out["AUC"]))

    cfg = EvalConfig(
        model_type="Alike", task_type="AUC",
        data_params={"type": "synthetic_se3", "num_pairs": n,
                     "image_size": 256, "seed": 3},
        extractor_params=ep,
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"th": [5, 10, 20]},
        output_dir=str(tmp_path / "ours"))
    ours = Evaluator(cfg).run()
    our_errs = ours["per_pair_error"]

    assert len(our_errs) == len(ref_errs)
    for i, (oe, re) in enumerate(zip(our_errs, ref_errs)):
        # clean synthetic pairs: both solvers must land in the same
        # low-error regime (no 180-degree failures on either side);
        # per-pair values differ by RANSAC draw (cv2 vs ours)
        assert re < 15.0, (i, re)
        assert oe < 15.0, (i, oe)
    # in aggregate our solver must not be worse than the cv2 chain
    assert float(np.mean(our_errs)) < float(np.mean(ref_errs)) + 3.0, \
        (our_errs, ref_errs)

    # at the loosest threshold every pair resolves the same way on both
    # sides, so the recall integrals must agree tightly; tighter thresholds
    # feel the per-pair RANSAC noise (4 pairs = 0.25 recall steps)
    ths = (5.0, 10.0, 20.0)
    tol = {5.0: 0.35, 10.0: 0.25, 20.0: 0.12}
    ref_aucs = ref_pose_auc(np.asarray(ref_errs), ths)
    for t, ra in zip(ths, ref_aucs):
        assert abs(ours[f"AUC@{t:g}"] - float(ra)) < tol[t], \
            (t, ours[f"AUC@{t:g}"], ra)


def test_vo_parity_vs_reference(ref_env, tmp_path):
    """Reference VO step loop (tasks/visual_odometer.py:10-96: detection +
    BF matching + cv2 essential/recoverPose + GT-scale chaining) vs our
    visual_odometer task on the same synthetic splat sequence."""
    import torch
    from models.ALike import ALNet
    from tasks.visual_odometer import visual_odometry as ref_vo
    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticSplatSequenceDataset
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    model = ALNet({"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64})
    model.load_state_dict(torch.load(f"{REF}/weights/alike-t.pth",
                                     map_location="cpu"))
    model.eval()

    class GT:
        """pypose-SE3 stand-in: .tensor()[0:3] = translation, which is all
        visual_odometry reads (visual_odometer.py:84-86)."""

        def __init__(self, T):
            self._t = torch.as_tensor(
                np.concatenate([np.asarray(T)[0:3, 3],
                                [0.0, 0.0, 0.0, 1.0]]).astype(np.float32))

        def tensor(self):
            return self._t

    n = 5
    ds = SyntheticSplatSequenceDataset(n, 256, seed=0)
    ep = dict(EP, nms_dist=4, top_k=300)
    ref_params = {
        "extractor_params": ep,
        "matcher_params": {"type": "brute_force",
                           "brute_force_params": dict(BF)},
        "visual_odometer_params": {"output": str(tmp_path)},
    }
    pose_R = np.eye(3)
    pose_t = np.zeros((3, 1))
    ref_positions = [pose_t.copy()]
    prev = ds[0]
    for i in range(1, n):
        cur = ds[i]
        img0 = torch.from_numpy(
            np.asarray(prev["image0"], np.float32).transpose(2, 0, 1))[None]
        img1 = torch.from_numpy(
            np.asarray(cur["image0"], np.float32).transpose(2, 0, 1))[None]
        with torch.no_grad():
            s0, d0 = model(img0)
            s1, d1 = model(img1)
        batch = {"image0": img1, "fx": float(cur["fx"]),
                 "cx": float(cur["cx"]), "cy": float(cur["cy"]),
                 "ground_truth": GT(cur["ground_truth"]),
                 "last_ground_truth": GT(cur["last_ground_truth"])}
        out = ref_vo(i, pose_R, pose_t, img0, batch, s0, s1, d0, d1,
                     None, ref_params)
        pose_R, pose_t = out["R"], out["t"]
        ref_positions.append(np.asarray(pose_t).reshape(3, 1))
    ref_t = np.stack(ref_positions)  # [n, 3, 1]

    cfg = EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence", "num_frames": n,
                     "image_size": 256},
        extractor_params=ep,
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={}, output_dir=str(tmp_path / "ours"), seed=0)
    ours = Evaluator(cfg).run()
    # our chain keeps the initial identity ahead of the n sequence steps
    # ((b0,b0) first, _iter_sequence) — drop it to align with the reference
    # loop's per-frame positions
    our_t = ours["t_est"][1:]  # [n, 3, 1]

    assert our_t.shape[0] == ref_t.shape[0]
    # same data, different RANSAC draws: trajectories must agree step by
    # step well within the ~1.4m travelled, and share the dominant (+x in
    # camera frame => -x in chained-position convention) direction
    end_gap = np.linalg.norm(our_t[-1, :, 0] - ref_t[-1, :, 0])
    assert end_gap < 0.4, (our_t[-1, :, 0], ref_t[-1, :, 0])
    for i in range(n):
        assert np.linalg.norm(our_t[i, :, 0] - ref_t[i, :, 0]) < 0.4, \
            (i, our_t[i, :, 0], ref_t[i, :, 0])
    assert abs(ref_t[-1, 0, 0]) > abs(ref_t[-1, 2, 0])
    assert abs(our_t[-1, 0, 0]) > abs(our_t[-1, 2, 0])
