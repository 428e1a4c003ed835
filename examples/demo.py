"""End-to-end demo: detect, match, estimate geometry, and render overlays on
a synthetic pair — the framework equivalent of the reference's per-module
__main__ demos (e.g. models/lightglue.py:688-1050), runnable with zero
external data.

    python examples/demo.py [--model Alike] [--out /tmp/kbt_demo]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Alike")
    ap.add_argument("--out", default="/tmp/kbt_demo")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import cv2
    import jax
    import numpy as np
    import jax.numpy as jnp

    from keypoint_bench_tpu.datasets.synthetic import \
        SyntheticHomographyDataset
    from keypoint_bench_tpu.geometry.ransac import ransac_homography
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.ops.detect import DetectParams, detection
    from keypoint_bench_tpu.ops.matching import brute_force_match
    from keypoint_bench_tpu.utils import visualization as vz
    from keypoint_bench_tpu.weights import load_params

    os.makedirs(args.out, exist_ok=True)
    sample = SyntheticHomographyDataset(1, args.size)[0]
    img0 = jnp.asarray(sample["image0"])
    img1 = jnp.asarray(sample["image1"])

    model = get_model(args.model)
    params = {} if args.model in ("Harris", "ORB", "SIFT") else \
        load_params(args.model)
    dp = DetectParams(nms_dist=6, border_dist=8, top_k=1000)

    @jax.jit
    def pipeline(im0, im1):
        s0, d0 = model(params, im0[None])
        s1, d1 = model(params, im1[None])
        k0, v0 = detection(s0[0], dp)
        k1, v1 = detection(s1[0], dp)
        if d0 is None:
            return (k0, v0, k1, v1) + (None,) * 3
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, d0[0], d1[0], 5.0)
        return k0, v0, k1, v1, m0, m1, ok

    out = pipeline(img0, img1)
    k0, v0, k1, v1 = out[:4]
    print(f"{args.model}: {int(jnp.sum(v0))} / {int(jnp.sum(v1))} keypoints")

    cv2.imwrite(os.path.join(args.out, "keypoints0.png"),
                vz.plot_kps_error(img0, np.asarray(k0), np.asarray(v0)))
    cv2.imwrite(os.path.join(args.out, "keypoints1.png"),
                vz.plot_kps_error(img1, np.asarray(k1), np.asarray(v1)))

    if out[4] is not None:
        m0, m1, ok = out[4:]
        okn = np.asarray(ok)
        s = args.size - 1
        p0 = np.asarray(m0)[okn, :2] * s
        p1 = np.asarray(m1)[okn, :2] * s
        print(f"matches: {okn.sum()}")
        cv2.imwrite(os.path.join(args.out, "matches.png"),
                    vz.plot_matches(img0, img1, p0, p1))
        H, inl, okh = ransac_homography(jnp.asarray(p0), jnp.asarray(p1),
                                        jnp.ones(len(p0), bool),
                                        jax.random.key(0))
        gt = sample["warp01_params"]["homography_matrix"]
        print("estimated H vs GT (normalized):")
        print(np.round(np.asarray(H) / np.asarray(H)[2, 2], 3))
        print(np.round(gt / gt[2, 2], 3))
    print("outputs in", args.out)


if __name__ == "__main__":
    main()
