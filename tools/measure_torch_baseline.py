"""Measure the PyTorch reference pipeline (ALIKE-t forward + fast_nms
detection + brute-force matching, protocol of config/config.yaml) on this
host's CPU, and store frames/s into baselines/torch_cpu.json for bench.py's
vs_baseline ratio.

Run once: python tools/measure_torch_baseline.py
Uses the reference implementation at /root/reference (read-only) via the same
import stubs as tests/golden/make_golden.py. No TPU/JAX involved.
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "golden"))

REF = "/root/reference"


def main():
    from make_golden import install_stubs
    sys.path.insert(0, REF)
    install_stubs()
    import torch
    torch.set_num_threads(os.cpu_count() or 4)
    from models.ALike import ALNet
    from utils.extracter import detection

    m = ALNet({"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64})
    m.load_state_dict(torch.load(f"{REF}/weights/alike-t.pth",
                                 map_location="cpu"))
    m.eval()

    rng = np.random.default_rng(0)
    img0 = torch.from_numpy(rng.random((1, 3, 512, 512)).astype("float32"))
    img1 = torch.from_numpy(rng.random((1, 3, 512, 512)).astype("float32"))
    params = {"nms_dist": 6, "threshold": 0.0, "border_dist": 8,
              "top_k": 1000, "min_score": 0.0}

    def match_bf(p0, p1, d0, d1):
        # mutual-NN euclidean matching in torch (the skimage call's math)
        import torch.nn.functional as F
        g0 = F.grid_sample(d0, ((p0[:, :2] - 0.5) * 2)[None, None],
                           align_corners=True)[0, :, 0].T
        g1 = F.grid_sample(d1, ((p1[:, :2] - 0.5) * 2)[None, None],
                           align_corners=True)[0, :, 0].T
        dist = torch.cdist(g0, g1)
        nn01 = dist.argmin(1)
        nn10 = dist.argmin(0)
        mutual = nn10[nn01] == torch.arange(len(g0))
        return mutual.sum()

    def step():
        with torch.no_grad():
            s0, d0 = m(img0)
            s1, d1 = m(img1)
            p0 = detection(s0, params)
            p1 = detection(s1, params)
            n = match_bf(p0, p1, d0, d1)
        return n

    for _ in range(2):
        step()  # warmup
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    fps = 2.0 / dt  # 2 frames per pair step
    out = {
        "pipeline": "ALIKE-t extract(nms6,topk1000)+BF match, 512x512 pair",
        "framework": "pytorch-reference",
        "hardware": f"host CPU ({os.cpu_count()} threads)",
        "seconds_per_pair": dt,
        "frames_per_second": fps,
    }
    os.makedirs(os.path.join(ROOT, "baselines"), exist_ok=True)
    with open(os.path.join(ROOT, "baselines", "torch_cpu.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
