"""Real dataset-loader code paths driven by generated on-disk data (KITTI,
TartanAir, EuRoC, MegaDepth, ImagePairs, Images, Video contracts)."""
import os

import numpy as np
import pytest

from keypoint_bench_tpu.geometry import se3


def _png(path, img_u8):
    import cv2
    cv2.imwrite(str(path), img_u8)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_kitti_loader(tmp_path, rng):
    from keypoint_bench_tpu.datasets.sequences import KittiDataset
    seq = tmp_path / "seq"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (370, 1226, 3), dtype=np.uint8)
        _png(seq / "image_0" / f"{i:06d}.png", img)
        _png(seq / "image_1" / f"{i:06d}.png", img)
    gt = tmp_path / "00.txt"
    with open(gt, "w") as f:
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = 0.5 * i
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    ds = KittiDataset(str(seq) + "/", str(gt))
    assert len(ds) == 3
    s = ds[1]
    assert s["image0"].shape == (352, 1216, 3)   # reference crop
    assert s["dataset"] == "Kitti"
    # scale between consecutive GT poses = 0.5
    d = np.linalg.norm(s["ground_truth"][:3, 3]
                       - s["last_ground_truth"][:3, 3])
    assert abs(d - 0.5) < 1e-6
    # F matrix annihilates corresponding points of the pure-x translation:
    # epipolar lines are horizontal; x0 and its shifted x1 satisfy x1^T F x0=0
    F = s["fundamental"]
    assert np.abs(F).max() > 0
    # F cache written
    assert os.path.exists(str(gt).replace(".txt", "_fundamental.npy"))


def test_tartanair_loader(tmp_path, rng):
    from keypoint_bench_tpu.datasets.sequences import TartanAirDataset
    seq = tmp_path / "ta"
    seq.mkdir()
    for i in range(3):
        _png(seq / f"{i:06d}.png",
             rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    gt = tmp_path / "ME000.txt"
    with open(gt, "w") as f:
        for i in range(3):
            # x y z qx qy qz qw
            f.write(f"{0.3*i} 0 0 0 0 0 1\n")
    ds = TartanAirDataset(str(seq) + "/", str(gt))
    assert len(ds) == 3
    s = ds[2]
    assert s["dataset"] == "TartanAir"
    assert s["image0"].shape == (480, 640, 3)
    assert abs(np.linalg.norm(
        s["ground_truth"][:3, 3] - s["last_ground_truth"][:3, 3]) - 0.3) < 1e-5


def test_euroc_loader(tmp_path, rng):
    from keypoint_bench_tpu.datasets.sequences import EurocDataset
    root = tmp_path / "mav0"
    for cam in ("cam0", "cam1"):
        (root / cam / "data").mkdir(parents=True)
        with open(root / cam / "data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            for i in range(2):
                name = f"{1000+i}.png"
                f.write(f"{1000+i},{name}\n")
                _png(root / cam / "data" / name,
                     rng.integers(0, 255, (480, 752, 3), dtype=np.uint8))
    gtd = root / "state_groundtruth_estimate0"
    gtd.mkdir()
    with open(gtd / "data.csv", "w") as f:
        f.write("#ts,px,py,pz,qw,qx,qy,qz\n")
        for i in range(2):
            f.write(f"{1000+i},{0.1*i},0,0,1,0,0,0\n")
    # IMU CSV: 200 Hz-ish samples between the two frames
    (root / "imu0").mkdir()
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#ts,gx,gy,gz,ax,ay,az\n")
        for k in range(10):
            # timestamps straddle the frame interval [1000, 1001)
            f.write(f"{1000 + k/10},0,0,0.5,0,0,9.81\n")
    ds = EurocDataset(str(root) + "/")
    assert len(ds) == 2
    s = ds[1]
    assert s["dataset"] == "Euroc"
    assert s["image0"].shape[1] == 736   # reference width crop
    assert np.isfinite(s["fundamental"]).all()
    pre = ds.imu_between(1)
    assert pre is not None
    assert float(pre["dt"]) > 0
    assert np.isfinite(np.asarray(pre["dR"])).all()


def test_uma_images_video_loaders(tmp_path, rng):
    import cv2
    from keypoint_bench_tpu.datasets.sequences import (UMADataset,
                                                       ImagesDataset,
                                                       VideoDataset)
    # UMA: cam0/cam1 CSVs + images
    root = tmp_path / "uma"
    for cam in ("cam0", "cam1"):
        (root / cam / "data").mkdir(parents=True)
        with open(root / cam / "data.csv", "w") as f:
            f.write("#ts,filename\n")
            for i in range(2):
                f.write(f"{i},{i}.png\n")
                _png(root / cam / "data" / f"{i}.png",
                     rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    uma = UMADataset(str(root) + "/")
    assert len(uma) == 2
    assert uma[0]["image0"].shape == (64, 96, 3)

    # Images: directory of stills
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        _png(d / f"{i}.png", rng.integers(0, 255, (32, 48, 3),
                                          dtype=np.uint8))
    ims = ImagesDataset(str(d))
    assert len(ims) == 3
    assert ims[1]["image0"].shape == (32, 48, 3)

    # Video: write an mp4 and stream frames
    vpath = str(tmp_path / "v.avi")
    wr = cv2.VideoWriter(vpath, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (48, 32))
    for i in range(4):
        wr.write(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    wr.release()
    vd = VideoDataset(vpath)
    assert len(vd) == 4
    assert vd[0]["image0"].shape == (32, 48, 3)


def test_megadepth_loader(tmp_path, rng):
    import json
    import h5py
    from keypoint_bench_tpu.datasets.pairs import MegaDepthDataset
    root = tmp_path / "md"
    (root / "imgs").mkdir(parents=True)
    (root / "depths").mkdir()
    (root / "calib").mkdir()
    names = []
    for i in range(2):
        name = f"im{i}.jpg"
        names.append(name)
        import cv2
        cv2.imwrite(str(root / "imgs" / name),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        with h5py.File(root / "depths" / f"im{i}.h5", "w") as f:
            f.create_dataset("/depth", data=np.full((48, 64), 5.0, "float32"))
        with h5py.File(root / "calib" / f"calibration_im{i}.h5", "w") as f:
            f.create_dataset("K", data=np.array(
                [[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]))
            f.create_dataset("R", data=np.eye(3))
            f.create_dataset("T", data=np.array([0.1 * i, 0.0, 0.0]))
    with open(root / "dataset.json", "w") as f:
        json.dump({"scene0": {
            "image_path": "imgs", "depth_path": "depths",
            "calib_path": "calib", "images": names,
            "tuples": [[0, 1]]}}, f)
    ds = MegaDepthDataset(str(root))
    assert len(ds) == 1
    s = ds[0]
    assert s["dataset"] == "megaDepth"
    wp = s["warp01_params"]
    assert wp["mode"] == "se3"
    # relative pose: 0.1m translation in x
    np.testing.assert_allclose(wp["pose01"][:3, 3], [0.1, 0, 0], atol=1e-6)
    assert wp["depth0"].shape == s["image0"].shape[:2]

    # train modes (reference crop_or_scale variants)
    for mode, size in (("scale", 32), ("crop", 32), ("crop_scale", 32)):
        dst = MegaDepthDataset(str(root), image_size=size, train=True,
                               crop_or_scale=mode)
        st = dst[0]
        assert st["image0"].shape == (size, size, 3), mode
        wpt = st["warp01_params"]
        assert wpt["depth0"].shape == (size, size), mode
        if mode == "crop":
            # bbox offsets flow into the SE3 warp; within source bounds
            assert (np.asarray(wpt["bbox0"]) >= 0).all()
        else:
            np.testing.assert_array_equal(np.asarray(wpt["bbox0"]), [0, 0])
        # geometric consistency through warp_se3: valid warps exist and
        # map near the GT projection for the constant-depth plane
        import jax.numpy as jnp
        from keypoint_bench_tpu.geometry.warp import warp_se3
        kp = np.array([[0.55, 0.5, 1.0]], np.float32)
        _, p01, v = warp_se3(jnp.asarray(kp), jnp.ones(1, bool),
                             jnp.asarray(wpt["pose01"]),
                             jnp.asarray(wpt["bbox0"]),
                             jnp.asarray(wpt["bbox1"]),
                             jnp.asarray(wpt["depth0"]),
                             jnp.asarray(wpt["depth1"]),
                             jnp.asarray(wpt["intrinsics0"]),
                             jnp.asarray(wpt["intrinsics1"]))
        assert np.isfinite(np.asarray(p01)).all(), mode
