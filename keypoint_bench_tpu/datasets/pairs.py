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


def _scale_intrinsics(K, sx, sy):
    """reference utils/projection.py:7-9: K' = diag(1/sx, 1/sy, 1) @ K."""
    S = np.diag([1.0 / sx, 1.0 / sy, 1.0]).astype("float32")
    return S @ K


def _central_match(depth0, K0, depth1, K1, pose01, rng, downsample=10):
    """Pick a covisible pixel of view0 and its projection in view1 via a
    z-buffered depth warp (reference megadepth.py:176-210 central_match)."""
    import cv2
    d0 = cv2.resize(depth0, (depth0.shape[1] // downsample,
                             depth0.shape[0] // downsample))
    d1 = cv2.resize(depth1, (depth1.shape[1] // downsample,
                             depth1.shape[0] // downsample))
    K0s = _scale_intrinsics(K0, downsample, downsample)
    K1s = _scale_intrinsics(K1, downsample, downsample)
    h, w = d0.shape
    ys, xs = np.mgrid[0:h, 0:w]
    valid = d0 > 0
    if not valid.any():
        return (np.array([depth0.shape[0] / 2, depth0.shape[1] / 2]),
                np.array([depth1.shape[0] / 2, depth1.shape[1] / 2]))
    idx = rng.integers(0, int(valid.sum()))
    y0 = ys[valid].ravel()[idx]
    x0 = xs[valid].ravel()[idx]
    z = d0[y0, x0]
    X = np.linalg.inv(K0s) @ np.array([x0 * z, y0 * z, z])
    X1 = pose01[:3, :3] @ X + pose01[:3, 3]
    uv1 = K1s @ X1
    uv1 = uv1[:2] / max(uv1[2], 1e-9)
    return (np.array([y0, x0]) * downsample, uv1[::-1] * downsample)


class MegaDepthDataset:
    """MegaDepth pairs with depth/pose/intrinsics SE3 warp params
    (reference datasets/megadepth.py). Test path: no crop (bbox = 0).
    Train path supports the reference's crop_or_scale modes:
      'scale'      resize both views to image_size^2, rescale intrinsics
      'crop'       pad + crop image_size^2 windows around a covisible
                   central match (bbox offsets flow into the SE3 warp)
      'crop_scale' crop a max square around the match, then resize
    """

    def __init__(self, root: str, image_size: int = 512, gray: bool = False,
                 train: bool = False, crop_or_scale: str = "scale",
                 seed: int = 0):
        self.root = Path(root)
        self.image_size = image_size
        self.gray = gray
        self.train = train
        self.crop_or_scale = crop_or_scale
        self._rng = np.random.default_rng(seed)
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

    @staticmethod
    def _pad_min(img, depth, size):
        h, w = img.shape[:2]
        ph, pw = max(size - h, 0), max(size - w, 0)
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            depth = np.pad(depth, ((0, ph), (0, pw)))
        return img, depth

    @staticmethod
    def _crop_at(img, depth, center_rc, size):
        h, w = img.shape[:2]
        r = int(np.clip(center_rc[0] - size // 2, 0, max(h - size, 0)))
        c = int(np.clip(center_rc[1] - size // 2, 0, max(w - size, 0)))
        return (img[r:r + size, c:c + size], depth[r:r + size, c:c + size],
                np.array([r, c], "float32"))

    def _train_transform(self, img1, depth1, K1, img2, depth2, K2, pose12):
        import cv2
        s = self.image_size
        if self.crop_or_scale == "scale":
            h1, w1 = img1.shape[:2]
            h2, w2 = img2.shape[:2]
            img1 = cv2.resize(img1, (s, s))
            depth1 = cv2.resize(depth1, (s, s))
            K1 = _scale_intrinsics(K1, w1 / s, h1 / s)
            img2 = cv2.resize(img2, (s, s))
            depth2 = cv2.resize(depth2, (s, s))
            K2 = _scale_intrinsics(K2, w2 / s, h2 / s)
            z2 = np.zeros(2, "float32")
            return img1, depth1, K1, z2, img2, depth2, K2, z2
        c1, c2 = _central_match(depth1, K1, depth2, K2, pose12, self._rng)
        if self.crop_or_scale == "crop":
            img1, depth1 = self._pad_min(img1, depth1, s)
            img2, depth2 = self._pad_min(img2, depth2, s)
            img1, depth1, b1 = self._crop_at(img1, depth1, c1, s)
            img2, depth2, b2 = self._crop_at(img2, depth2, c2, s)
            return img1, depth1, K1, b1, img2, depth2, K2, b2
        if self.crop_or_scale == "crop_scale":
            def one(img, depth, K, c):
                sq = min(img.shape[:2])
                img, depth, b = self._crop_at(img, depth, c, sq)
                K = K.copy()
                K[0, 2] -= b[1]
                K[1, 2] -= b[0]
                img = cv2.resize(img, (s, s))
                depth = cv2.resize(depth, (s, s))
                K = _scale_intrinsics(K, sq / s, sq / s)
                return img, depth, K
            img1, depth1, K1 = one(img1, depth1, K1, c1)
            img2, depth2, K2 = one(img2, depth2, K2, c2)
            z2 = np.zeros(2, "float32")
            return img1, depth1, K1, z2, img2, depth2, K2, z2
        raise ValueError(f"unknown crop_or_scale {self.crop_or_scale!r}")

    def __getitem__(self, idx):
        img1, depth1, K1, pose1 = self._read_one(self.pairs[idx][0])
        img2, depth2, K2, pose2 = self._read_one(self.pairs[idx][1])
        pose12 = (pose2 @ np.linalg.inv(pose1)).astype("float32")
        pose21 = np.linalg.inv(pose12).astype("float32")
        z2 = np.zeros(2, "float32")
        if self.train:
            (img1, depth1, K1, b1, img2, depth2, K2, b2) = \
                self._train_transform(img1, depth1, K1, img2, depth2, K2,
                                      pose12)
            return {
                "image0": img1, "image1": img2,
                "warp01_params": {"mode": "se3", "width": img1.shape[1],
                                  "height": img1.shape[0], "pose01": pose12,
                                  "bbox0": b1, "bbox1": b2, "depth0": depth1,
                                  "depth1": depth2, "intrinsics0": K1,
                                  "intrinsics1": K2},
                "warp10_params": {"mode": "se3", "width": img2.shape[1],
                                  "height": img2.shape[0], "pose01": pose21,
                                  "bbox0": b2, "bbox1": b1, "depth0": depth2,
                                  "depth1": depth1, "intrinsics0": K2,
                                  "intrinsics1": K1},
                "dataset": "megaDepth",
            }
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
