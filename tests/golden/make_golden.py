"""Generate golden activation fixtures from the reference torch models.

Run manually (requires /root/reference mounted):
    python tests/golden/make_golden.py

For each model with available weights, runs the *reference* implementation on a
fixed random image and stores (score_map, desc_map) as float32 npz. The parity
tests (test_models.py) compare our JAX implementations against these fixtures,
so the suite stays hermetic once fixtures exist.
"""
import os
import sys
import types

import numpy as np

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def install_stubs():
    import torch
    import torch.nn as nn

    # torchvision.models.resnet conv helpers (standard public API shapes)
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvr = types.ModuleType("torchvision.models.resnet")

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, 3, stride=stride,
                         padding=dilation, groups=groups, bias=False,
                         dilation=dilation)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)

    def vgg16(**kwargs):
        """Standard torchvision VGG16 `features` layout (config D)."""
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_c = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_c, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_c = v
        m = types.SimpleNamespace()
        m.features = nn.Sequential(*layers)
        return m

    tvr.conv3x3 = conv3x3
    tvr.conv1x1 = conv1x1
    tvm.resnet = tvr
    tvm.vgg16 = vgg16
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.resnet"] = tvr
    for name in ("openvino", "tensorrt", "onnx", "thop", "kornia",
                 "kornia.filters", "kornia.geometry", "pypose",
                 "pytorch_lightning", "skimage", "skimage.feature"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    def match_descriptors(d0, d1, metric="euclidean", max_distance=np.inf,
                          cross_check=True):
        """skimage.feature.match_descriptors semantics (numpy oracle)."""
        dist = np.linalg.norm(d0[:, None] - d1[None], axis=2)
        nn01 = dist.argmin(1)
        nn10 = dist.argmin(0)
        idx = np.arange(len(d0))
        keep = np.ones(len(d0), bool)
        if cross_check:
            keep &= nn10[nn01] == idx
        if np.isfinite(max_distance):
            keep &= dist[idx, nn01] < max_distance
        return np.stack([idx[keep], nn01[keep]], axis=1)

    sys.modules["skimage"].feature = sys.modules["skimage.feature"]
    sys.modules["skimage.feature"].match_descriptors = match_descriptors
    # kornia pieces used by KeyNet
    import torch.nn.functional as F

    class SpatialGradient(nn.Module):
        """kornia.filters.SpatialGradient equivalent (sobel, normalized)."""
        def __init__(self, mode="sobel", order=1):
            super().__init__()
            k = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
            k = k / 8.0
            self.register_buffer("kx", k[None, None])
            self.register_buffer("ky", k.t()[None, None])

        def forward(self, x):
            b, c, h, w = x.shape
            xf = x.reshape(b * c, 1, h, w)
            xp = F.pad(xf, (1, 1, 1, 1), mode="replicate")
            gx = F.conv2d(xp, self.kx)
            gy = F.conv2d(xp, self.ky)
            return torch.stack([gx, gy], dim=2).reshape(b, c, 2, h, w)

    def gaussian_blur2d(x, kernel_size, sigma):
        ks = kernel_size[0]
        sig = sigma[0]
        half = ks // 2
        g = torch.exp(-torch.arange(-half, half + 1, dtype=torch.float32) ** 2
                      / (2 * sig ** 2))
        g = g / g.sum()
        k2 = g[:, None] * g[None, :]
        b, c, h, w = x.shape
        xf = x.reshape(b * c, 1, h, w)
        xp = F.pad(xf, (half, half, half, half), mode="reflect")
        y = F.conv2d(xp, k2[None, None])
        return y.reshape(b, c, h, w)

    _sg = SpatialGradient()

    def spatial_gradient(x, mode="sobel", order=1, normalized=True):
        return _sg(x)

    def filter2d(x, kernel, border_type="reflect", normalized=False):
        # kernel [1, kh, kw]
        k = kernel[0]
        kh, kw = k.shape
        b, c, h, w = x.shape
        xf = x.reshape(b * c, 1, h, w)
        xp = F.pad(xf, (kw // 2, kw // 2, kh // 2, kh // 2), mode=border_type)
        y = F.conv2d(xp, k[None, None])
        return y.reshape(b, c, h, w)

    sys.modules["kornia"].filters = sys.modules["kornia.filters"]
    sys.modules["kornia.filters"].SpatialGradient = SpatialGradient
    sys.modules["kornia.filters"].spatial_gradient = spatial_gradient
    sys.modules["kornia.filters"].filter2d = filter2d
    sys.modules["kornia.filters"].gaussian_blur2d = gaussian_blur2d
    sys.modules["kornia"].SpatialGradient = SpatialGradient
    sys.modules["kornia"].spatial_gradient = spatial_gradient
    sys.modules["kornia"].filter2d = filter2d


def randomize(model, seed):
    """Random weights + non-trivial BN stats so layout bugs can't hide.

    The draw sequence MUST stay stable (state_dict order, one draw per
    tensor): the randomized-model golden fixtures and the reference-parity
    tests (test_metric_parity_ext.py) both rebuild weights from the seed.
    """
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not torch.is_tensor(v) or not v.dtype.is_floating_point:
            continue
        if "running_var" in k:
            v.copy_(0.5 + torch.rand(v.shape, generator=g))
        elif "running_mean" in k:
            v.copy_(0.2 * torch.randn(v.shape, generator=g))
        elif "confidence_thresholds" in k:
            # derived buffer, not a weight (lightglue.py:424-429): draw
            # to keep the RNG sequence stable, but leave the buffer alone
            torch.randn(v.shape, generator=g)
        else:
            v.copy_(0.3 * torch.randn(v.shape, generator=g))
    model.load_state_dict(sd)
    return model


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root
    sys.path.insert(0, REF)
    install_stubs()
    import torch

    rng = np.random.default_rng(0)
    img = rng.random((1, 3, 64, 64)).astype(np.float32)
    timg = torch.from_numpy(img)

    out = {}

    def run(name, build, store_params=False, image=None):
        try:
            model = build()
            model.eval()
            ti = torch.from_numpy(image) if image is not None else timg
            with torch.no_grad():
                score, desc = model(ti)
            rec = {"image": (image if image is not None else img),
                   "score": score.numpy()}
            if desc is not None:
                rec["desc"] = desc.numpy()
            if store_params:
                from keypoint_bench_tpu.weights.convert import convert_state_dict
                for k, v in convert_state_dict(model.state_dict()).items():
                    rec[f"param:{k}"] = v
            np.savez(os.path.join(HERE, f"{name}.npz"), **rec)
            print("golden ok:", name)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print("golden FAIL:", name, repr(e))

    def build_alike():
        from models.ALike import ALNet
        p = {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64}
        m = ALNet(p)
        m.load_state_dict(torch.load(f"{REF}/weights/alike-t.pth",
                                     map_location="cpu"))
        return m

    def build_letnet():
        from models.LETNet import LETNet
        m = LETNet(c1=8, c2=16, grayscale=False)
        m.load_state_dict(torch.load(f"{REF}/weights/letnet.pth",
                                     map_location="cpu"))
        return m

    def build_goodpoint():
        from models.GoodPoint import GoodPoint
        m = GoodPoint({"c0": 3, "c1": 8, "h0": 4})
        m.load_state_dict(torch.load(f"{REF}/weights/goodpoint.pth",
                                     map_location="cpu"))
        return m

    def build_edgepoint():
        from models.EdgePoint import EdgePoint
        p = {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64,
             "single_head": True}
        m = EdgePoint(p)
        m.load_state_dict(torch.load(f"{REF}/weights/EdgePoint.pt",
                                     map_location="cpu"))
        return m

    def build_keynet():
        from models.KeyNet import KeyNet
        m = KeyNet({"num_filters": 8, "num_levels": 3, "kernel_size": 5})
        ck = torch.load(f"{REF}/weights/keynet_pytorch.pth",
                        map_location="cpu")
        m.load_state_dict(ck["state_dict"])
        return m

    def build_r2d2():
        ck = torch.load(f"{REF}/weights/r2d2_WASF_N16.pt", map_location="cpu")
        from models import r2d2 as r2d2mod
        m = eval(ck["net"], vars(r2d2mod))
        m.load_state_dict({k.replace("module.", ""): v
                           for k, v in ck["state_dict"].items()})
        return m

    # models with shipped weights: real checkpoints
    run("Alike", build_alike)
    run("LETNet", build_letnet)
    run("GoodPoint", build_goodpoint)
    run("EdgePoint", build_edgepoint)
    run("KeyNet", build_keynet)
    run("r2d2", build_r2d2)

    # models whose blobs are missing: randomized weights stored inside the
    # fixture (architecture parity is what's under test)
    def build_superpoint():
        from models.SuperPoint import SuperPointNet
        return randomize(SuperPointNet(), 10)

    def build_xfeat():
        from models.XFeat import XFeatModel
        return randomize(XFeatModel(), 11)

    def build_disk():
        from models.disk import DISK
        return randomize(DISK(), 12)

    def build_sfd2():
        from models.sfd2 import ResSegNetV2
        return randomize(ResSegNetV2(outdim=128, require_stability=True), 13)

    def build_d2net():
        from models.D2_Net import D2Net
        return randomize(D2Net(model_file=None, use_cuda=False), 14)

    run("SuperPoint", build_superpoint, store_params=True)
    run("XFeat", build_xfeat, store_params=True)
    run("DISK", build_disk, store_params=True)
    run("sfd2", build_sfd2, store_params=True)
    run("D2Net", build_d2net, store_params=True)

    # LightGlue: randomized weights, deterministic mode (no early exit /
    # pruning), raw keypoints+descriptors in, matches out
    try:
        from models.lightglue import LightGlue
        orig_load = torch.load
        torch.load = lambda *a, **k: {}
        try:
            lg = LightGlue(features="superpoint", weight_path="/nonexistent",
                           depth_confidence=-1, width_confidence=-1,
                           flash=False)
        finally:
            torch.load = orig_load
        randomize(lg, 20)
        lg.eval()
        rg = np.random.default_rng(20)
        M, N = 64, 80
        kpts0 = rg.uniform(0, 511, (1, M, 2)).astype(np.float32)
        kpts1 = rg.uniform(0, 511, (1, N, 2)).astype(np.float32)
        de0 = rg.normal(0, 1, (1, M, 256)).astype(np.float32)
        de1 = rg.normal(0, 1, (1, N, 256)).astype(np.float32)
        with torch.no_grad():
            out = lg({"image0": {"keypoints": torch.from_numpy(kpts0),
                                 "descriptors": torch.from_numpy(de0)},
                      "image1": {"keypoints": torch.from_numpy(kpts1),
                                 "descriptors": torch.from_numpy(de1)}})
        from keypoint_bench_tpu.weights.convert import convert_state_dict
        rec = {
            "kpts0": kpts0, "kpts1": kpts1, "desc0": de0, "desc1": de1,
            "matches0": out["matches0"].numpy(),
            "mscores0": out["matching_scores0"].numpy(),
        }
        for k, v in convert_state_dict(lg.state_dict()).items():
            rec[f"param:{k}"] = v
        np.savez(os.path.join(HERE, "lightglue.npz"), **rec)
        print("golden ok: lightglue")

        # adaptive mode (reference defaults: early exit + width pruning,
        # which on CPU always prunes) with the same weights/inputs
        orig_load = torch.load
        torch.load = lambda *a, **k: {}
        try:
            lg2 = LightGlue(features="superpoint",
                            weight_path="/nonexistent", flash=False)
        finally:
            torch.load = orig_load
        lg2.load_state_dict(lg.state_dict())
        lg2.eval()
        with torch.no_grad():
            out2 = lg2({"image0": {"keypoints": torch.from_numpy(kpts0),
                                   "descriptors": torch.from_numpy(de0)},
                        "image1": {"keypoints": torch.from_numpy(kpts1),
                                   "descriptors": torch.from_numpy(de1)}})
        rec2 = {
            "kpts0": kpts0, "kpts1": kpts1, "desc0": de0, "desc1": de1,
            "matches0": out2["matches0"].numpy(),
            "mscores0": out2["matching_scores0"].numpy(),
            "stop": np.array(out2["stop"]),
        }
        np.savez(os.path.join(HERE, "lightglue_adaptive.npz"), **rec2)
        print("golden ok: lightglue_adaptive (stop=%d)" % out2["stop"])
    except Exception:
        import traceback
        traceback.print_exc()
        print("golden FAIL: lightglue")


if __name__ == "__main__":
    main()
