"""One-time torch .pth -> .npz converter (run with CPU torch).

Usage:  python -m keypoint_bench_tpu.weights.convert [--src DIR] [--dst DIR]

Layout transforms applied per tensor rank:
  4D conv [O, I, kh, kw]      -> HWIO [kh, kw, I, O]
  2D linear [out, in]         -> [in, out]
  1D (bn/bias/prelu)          -> unchanged

Checkpoint unwrapping mirrors the reference loaders
(models/model_interface.py:43-85) without the eval() hazard:
  keynet_pytorch.pth -> ['state_dict']; r2d2_*.pt -> ['state_dict'] with
  'module.' stripped; sfd2.pth -> ['model']; disk.pth -> ['extractor'].
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def to_numpy_layout(key: str, t) -> np.ndarray:
    a = t.detach().cpu().numpy()
    if a.ndim == 4:
        return np.transpose(a, (2, 3, 1, 0))  # OIHW -> HWIO
    if a.ndim == 2:
        return np.transpose(a, (1, 0))
    return a


def convert_state_dict(sd: dict) -> dict:
    import torch
    out = {}
    for k, v in sd.items():
        if torch.is_tensor(v) and v.dtype.is_floating_point:
            out[k] = to_numpy_layout(k, v)
    return out


# model name -> (weight file, unwrap fn)
SPECS = {
    "Alike": ("alike-t.pth", lambda c: c),
    "EdgePoint": ("EdgePoint.pt", lambda c: c),
    "GoodPoint": ("goodpoint.pth", lambda c: c),
    "LETNet": ("letnet.pth", lambda c: c),
    "KeyNet": ("keynet_pytorch.pth", lambda c: c["state_dict"]),
    "r2d2": ("r2d2_WASF_N16.pt",
             lambda c: {k.replace("module.", ""): v
                        for k, v in c["state_dict"].items()}),
    # large blobs, present only if the user supplies them:
    "SuperPoint": ("weights/superpoint_v1.pth", lambda c: c),
    "XFeat": ("weights/xfeat.pt", lambda c: c),
    "DISK": ("weights/disk.pth", lambda c: c["extractor"]),
    "sfd2": ("weights/sfd2.pth", lambda c: c["model"]),
    "D2Net": ("weights/d2_tf.pth", lambda c: c.get("model", c)),
    "lightglue_superpoint": ("weights/superpoint_lightglue.pth", lambda c: c),
    "lightglue_disk": ("weights/disk_lightglue.pth", lambda c: c),
    "lightglue_aliked": ("weights/aliked_lightglue.pth", lambda c: c),
}


def main(src: str, dst: str):
    import torch
    from keypoint_bench_tpu.weights.io import save_params

    converted, skipped = [], []
    for name, (fname, unwrap) in SPECS.items():
        path = os.path.join(src, fname)
        if not os.path.exists(path) or os.path.getsize(path) < 1024:
            skipped.append(name)
            continue
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = unwrap(ckpt)
        params = convert_state_dict(sd)
        save_params(name, params, dst)
        converted.append((name, len(params)))
    for name, n in converted:
        print(f"converted {name}: {n} tensors")
    if skipped:
        print(f"skipped (missing blobs): {', '.join(skipped)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/weights")
    ap.add_argument("--dst", default=None)
    args = ap.parse_args()
    from keypoint_bench_tpu.weights.io import WEIGHTS_DIR
    main(args.src, args.dst or WEIGHTS_DIR)
