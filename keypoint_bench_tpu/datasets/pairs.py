"""Image-pair datasets: HPatches, MegaDepth, ImagePairs.

Batch contracts mirror the reference loaders (datasets/hpatches.py:74-83,
datasets/megadepth.py:329-354, datasets/image_pairs.py:19-57) with NHWC numpy
images.
"""
from __future__ import annotations

import glob
import json
from pathlib import Path

import numpy as np


def _pnm_size(path):
    """(width, height) from a P5/P6 header without decoding pixels."""
    with open(path, "rb") as f:
        data = f.read(256).split()
    assert data[0] in (b"P5", b"P6"), path
    vals = [t for t in data[1:] if not t.startswith(b"#")]
    return int(vals[0]), int(vals[1])


def _imread_rgb(path, gray=False):
    import cv2
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    assert img is not None, f"can not load: {path}"
    if gray:
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype("float32") / 255.0
        return g[..., None]
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype("float32") / 255.0


class HPatchesDataset:
    """HPatches sequences: pairs (1, k) k=2..6 with GT homographies, images
    resized to image_size^2 (reference datasets/hpatches.py)."""

    def __init__(self, root: str, alteration: str = "all",
                 image_size: int = 512, gray: bool = False,
                 use_native: bool = True):
        assert Path(root).exists(), f"dataset root {root} does not exist"
        self.image_size = image_size
        self.gray = gray
        # native C++ PPM decode+resize pipeline when available (runtime/)
        self.use_native = use_native and not gray
        if self.use_native:
            from keypoint_bench_tpu.runtime import native_available
            self.use_native = native_available()
        self.items = []
        for folder in sorted(p for p in Path(root).iterdir() if p.is_dir()):
            if alteration in ("i", "v") and folder.stem[0] != alteration:
                continue
            n = len(glob.glob(str(folder / "*.ppm")))
            for i in range(2, 1 + n):
                self.items.append((folder / "1.ppm", folder / f"{i}.ppm",
                                   folder / f"H_1_{i}"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        p0, p1, hp = self.items[idx]
        s = self.image_size
        if self.use_native:
            from keypoint_bench_tpu.runtime import load_pnm_resized
            # original sizes from the PNM header (cheap text read)
            w0, h0 = _pnm_size(p0)
            w1, h1 = _pnm_size(p1)
            img0 = load_pnm_resized(str(p0), s, s)
            img1 = load_pnm_resized(str(p1), s, s)
        else:
            import cv2
            img0 = _imread_rgb(p0, self.gray)
            img1 = _imread_rgb(p1, self.gray)
            h0, w0 = img0.shape[:2]
            h1, w1 = img1.shape[:2]
            img0 = cv2.resize(img0, (s, s)).reshape(s, s, -1)
            img1 = cv2.resize(img1, (s, s)).reshape(s, s, -1)
        H = np.loadtxt(hp).astype("float32")
        return {
            "image0": img0, "image1": img1,
            "warp01_params": {"mode": "homo", "width": w1, "height": h1,
                              "homography_matrix": H, "resize": s},
            "warp10_params": {"mode": "homo", "width": w0, "height": h0,
                              "homography_matrix": np.linalg.inv(H),
                              "resize": s},
            "dataset": "HPatches",
        }


class MegaDepthDataset:
    """MegaDepth test pairs with depth/pose/intrinsics SE3 warp params
    (reference datasets/megadepth.py, test path: first two tuple indices per
    scene, no crop — bbox = 0)."""

    def __init__(self, root: str, image_size: int = 512, gray: bool = False):
        self.root = Path(root)
        self.image_size = image_size
        self.gray = gray
        with open(self.root / "dataset.json") as f:
            scenes = json.load(f)
        self.pairs = []
        for scene_name, sd in scenes.items():
            image_path = Path(sd["image_path"])
            depth_path = Path(sd["depth_path"])
            calib_path = Path(sd["calib_path"])
            for indices in sd["tuples"]:
                i, j = indices[0], indices[1]
                self.pairs.append(tuple(
                    self._paths(sd["images"][k], image_path, depth_path,
                                calib_path) for k in (i, j)))

    def _paths(self, name, image_path, depth_path, calib_path):
        base = name.split(".")[0] if name.endswith("jpg") else name
        img_name = name if name.endswith("jpg") else base + ".jpg"
        return (image_path / img_name, depth_path / (base + ".h5"),
                self.root / calib_path / f"calibration_{base}.h5")

    def __len__(self):
        return len(self.pairs)

    def _read_one(self, paths):
        import h5py
        from PIL import Image
        ipath, dpath, cpath = paths
        with h5py.File(self.root / dpath, "r") as f:
            depth = np.array(f["/depth"]).astype("float32")
        img = Image.open(self.root / ipath)
        if img.mode != "RGB":
            img = img.convert("RGB")
        img = np.array(img).astype("float32") / 255.0
        pose = np.eye(4, dtype="float32")
        with h5py.File(cpath, "r") as f:
            K = np.array(f["K"]).astype("float32")
            pose[:3, :3] = f["R"][()]
            pose[:3, 3] = f["T"][()]
        return img, depth, K, pose

    def __getitem__(self, idx):
        img1, depth1, K1, pose1 = self._read_one(self.pairs[idx][0])
        img2, depth2, K2, pose2 = self._read_one(self.pairs[idx][1])
        pose12 = (pose2 @ np.linalg.inv(pose1)).astype("float32")
        pose21 = np.linalg.inv(pose12).astype("float32")
        z2 = np.zeros(2, "float32")
        return {
            "image0": img1, "image1": img2,
            "warp01_params": {"mode": "se3", "width": img1.shape[1],
                              "height": img1.shape[0], "pose01": pose12,
                              "bbox0": z2, "bbox1": z2, "depth0": depth1,
                              "depth1": depth2, "intrinsics0": K1,
                              "intrinsics1": K2},
            "warp10_params": {"mode": "se3", "width": img2.shape[1],
                              "height": img2.shape[0], "pose01": pose21,
                              "bbox0": z2, "bbox1": z2, "depth0": depth2,
                              "depth1": depth1, "intrinsics0": K2,
                              "intrinsics1": K1},
            "dataset": "megaDepth",
        }


class ImagePairsDataset:
    """txt-listed image pairs (reference datasets/image_pairs.py)."""

    def __init__(self, path_file: str, gray: bool = False, resize=None):
        self.gray = gray
        self.resize = resize
        with open(path_file) as f:
            self.items = [line.strip().split()[:2]
                          for line in f if line.strip()]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        import cv2
        a, b = self.items[idx]
        img0 = _imread_rgb(a, self.gray)
        img1 = _imread_rgb(b, self.gray)
        if self.resize is not None:
            img0 = cv2.resize(img0, tuple(self.resize)).reshape(
                self.resize[1], self.resize[0], -1)
            img1 = cv2.resize(img1, tuple(self.resize)).reshape(
                self.resize[1], self.resize[0], -1)
        return {"image0": img0, "image1": img1, "dataset": "image_pair"}
