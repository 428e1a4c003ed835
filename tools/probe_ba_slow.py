"""Round-5 probe: why is the warm VO-BA refine 40x slower on real-run data?

Measured (bench.py vo+BA, KBT_VO_TIMING=1): with REAL chained poses the
eager gate (2x reprojection_errors) costs 12-15 s and warm ba_solve 5-6 s;
with identity-chain poses over the SAME matches/buckets (profile_r15) the
whole refine is 0.44 s. Same shapes, same compiled executables — so the
cost is data-VALUE dependent, or something about the pose realism changes
host-side LAPACK triangulation cost.

This probe rebuilds the exact window (same detection + matches) and times,
for (A) identity-chain poses and (B) realistic noisy-chain poses:
  - build_ba_problem host wall + triangulated point stats
  - eager gate (2x reprojection_errors + float()) vs a single jitted gate
  - warm ba_solve x2
  - (B) ba_solve again with points clamped to a sane range (data-value test)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("R15_FRAMES", "32"))
SIZE = int(os.environ.get("R15_SIZE", "512"))


def tt(label, fn, n=2):
    out = None
    for i in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
    print(f"  {label:44s} {dt * 1e3:9.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator
    from keypoint_bench_tpu.datasets.registry import (get_dataset,
                                                      register_preloaded)
    from keypoint_bench_tpu.tasks.vo_ba import build_ba_problem, chain_tracks
    from keypoint_bench_tpu.ba.gauss_newton import (BAProblem, ba_solve,
                                                    reprojection_errors)
    from keypoint_bench_tpu.ops.matching import mutual_nn_match

    base = get_dataset({"type": "synthetic_sequence", "num_frames": FRAMES,
                        "image_size": SIZE})
    items = [base[i] for i in range(len(base))]
    register_preloaded("probe_ba", items)
    cfg = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "preloaded", "name": "probe_ba"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 1000, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True},
        precision="bfloat16", output_dir="/tmp/kbt_probe_ba")
    ev = Evaluator(cfg)
    raw = [np.asarray(it["image0"], np.float32) for it in items]
    _, descs_s, kpts_s, valids_s = ev.detect_many(raw, sparse=True)

    def shift1(x):
        return jnp.concatenate([x[:1], x[:-1]])

    def match_batch(kpts, valids, descs):
        k0s, v0s, d0s = shift1(kpts), shift1(valids), shift1(descs)
        return jax.vmap(
            lambda v0, d0, v1, d1: mutual_nn_match(d0, d1, v0, v1, 5.0))(
            v0s, d0s, valids, descs)
    nn01s, mok = jax.jit(match_batch)(kpts_s, valids_s, descs_s)
    tracks = chain_tracks(np.asarray(nn01s), np.asarray(mok))
    print(f"tracks: {len(tracks)}")

    fx = float(items[0]["fx"]); cx = float(items[0]["cx"])
    cy = float(items[0]["cy"]); fy = float(items[0]["fy"])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    kpts_px = np.asarray(kpts_s)[:, :, :2] * np.array([SIZE - 1.0, SIZE - 1.0])

    n = FRAMES
    # (A) identity-chain: pure x-translation
    RA = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    tA = np.zeros((n, 3), np.float32)
    tA[:, 0] = np.arange(n) * 0.1
    # (B) realistic noisy chain: accumulate small random rotations + steps
    rngb = np.random.default_rng(3)
    import cv2
    RB = [np.eye(3, dtype=np.float32)]
    tB = [np.zeros(3, np.float32)]
    for i in range(1, n):
        dR, _ = cv2.Rodrigues(rngb.normal(0, 0.02, 3))
        s = 0.1
        RB.append((dR @ RB[-1]).astype(np.float32))
        tB.append((dR @ tB[-1] + s * rngb.normal(0.5, 0.3, 3))
                  .astype(np.float32))
    RB = np.stack(RB); tB = np.stack(tB)

    def gate_eager(prob):
        errs = reprojection_errors(prob)
        m = prob.mask & (errs < 20.0)
        p2 = BAProblem(prob.R, prob.t, prob.points, prob.cam_idx,
                       prob.pt_idx, prob.uv, m, prob.K)
        return float(jnp.sum(reprojection_errors(p2) * m)
                     / jnp.maximum(jnp.sum(m), 1)), p2

    @jax.jit
    def gate_jit(prob):
        errs = reprojection_errors(prob)
        m = prob.mask & (errs < 20.0)
        err0 = jnp.sum(errs * m) / jnp.maximum(jnp.sum(m), 1)
        return m, err0

    for name, Rw, tw in (("A identity-chain", RA, tA),
                         ("B noisy-chain", RB, tB)):
        print(f"== poses {name} ==")
        built = tt("build_ba_problem (host)",
                   lambda: build_ba_problem(kpts_px, tracks, Rw, tw, K))
        if built is None:
            print("  -> None (window rejected)")
            continue
        prob, n_pts = built
        X = np.asarray(prob.points)
        print(f"  |X| p50/p99/max: {np.percentile(np.abs(X), 50):.1f} "
              f"{np.percentile(np.abs(X), 99):.1f} {np.abs(X).max():.1f}")
        e0, p2 = tt("gate eager (2x reproj + float)",
                    lambda: gate_eager(prob))
        m, ej = tt("gate jitted",
                   lambda: jax.block_until_ready(gate_jit(prob)))
        print(f"  err0 eager {e0:.3f} jit {float(ej):.3f} "
              f"inliers {int(np.asarray(m).sum())}")
        tt("ba_solve warm", lambda: jax.block_until_ready(
            ba_solve(p2, iters=8, damping=1e-2, huber_delta=2.0)[0]))
        if name.startswith("B"):
            Xc = np.clip(X, -50.0, 50.0)
            p3 = BAProblem(p2.R, p2.t, jnp.asarray(Xc), p2.cam_idx,
                           p2.pt_idx, p2.uv, p2.mask, p2.K)
            tt("ba_solve warm, points clamped to +-50", lambda:
               jax.block_until_ready(
                   ba_solve(p3, iters=8, damping=1e-2, huber_delta=2.0)[0]))
            # which half is slow: rotations or points? swap in A's points
            pa = BAProblem(p2.R, p2.t,
                           jnp.asarray(np.asarray(built[0].points)),
                           p2.cam_idx, p2.pt_idx, p2.uv, p2.mask, p2.K)
            tt("ba_solve warm, B poses + B pts (same)", lambda:
               jax.block_until_ready(
                   ba_solve(pa, iters=8, damping=1e-2, huber_delta=2.0)[0]))


if __name__ == "__main__":
    main()
