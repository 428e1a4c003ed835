"""Round-5: split the VO e2e budget (round-4 verdict item 5).

Round-4 state: KBT_BENCH_MODE=vo = 10.51 frames/s (32 synthetic 512^2
frames), VO+BA = 1.62 frames/s, with the residual attributed to
"host->device transfer + per-chunk dispatch" (detect) and "BA solve +
journal" (refine) WITHOUT a split. This tool produces the split on real
TPU, all stages in ONE process (claim+compile overhead dominates
otherwise, CLAUDE.md):

  1. detect_many(sparse) wall              — as the runner runs it
  2. detect_many with prestaged device arrays (transfer excluded)
  3. the batched pair-solve jit (warm)     — vmapped match+RANSAC-E
  4. host pose chaining + trajectory write
  5. BA refine split: chain_tracks / build_ba_problem (host numpy) /
     reprojection gating (eager jnp dispatches) / warm ba_solve

Each timed twice, second number reported (first pays dispatch warmup).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("R15_FRAMES", "32"))
SIZE = int(os.environ.get("R15_SIZE", "512"))


def t2(label, fn):
    fn()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:48s} {dt * 1e3:9.1f} ms")
    return out, dt


def main():
    import jax
    import jax.numpy as jnp
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator
    from keypoint_bench_tpu.datasets.registry import (get_dataset,
                                                      register_preloaded)

    base = get_dataset({"type": "synthetic_sequence", "num_frames": FRAMES,
                        "image_size": SIZE})
    items = [base[i] for i in range(len(base))]
    register_preloaded("r15", items)
    cfg = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "preloaded", "name": "r15"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 1000, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True, "ba_refine": True},
        precision="bfloat16",
        output_dir="/tmp/kbt_r15")
    ev = Evaluator(cfg)

    print("== full runs (second = warm) ==")
    _, dt_full = t2("ev.run() [VO+BA, warm]", ev.run)
    print(f"  -> VO+BA frames/s: {FRAMES / dt_full:.2f}")

    raw = [np.asarray(it["image0"], np.float32) for it in items]

    print("== stage 1/2: detect ==")
    _, dt_det = t2("detect_many(sparse) incl. transfer",
                   lambda: jax.block_until_ready(
                       ev.detect_many(raw, sparse=True)[2]))
    jit = ev._jit_cached("detect_batch_sparse", ev._detect_batch_sparse_impl)
    chunks = [jnp.asarray(np.stack(raw[i0:i0 + 16]))
              for i0 in range(0, len(raw), 16)]
    for c in chunks:
        c.block_until_ready()

    def detect_prestaged():
        outs = [jit(c) for c in chunks]
        return jax.block_until_ready(outs[-1][2])
    _, dt_det_dev = t2("detect chunks prestaged on device", detect_prestaged)
    print(f"  -> transfer+stack share: {(dt_det - dt_det_dev) * 1e3:.1f} ms")

    # stage 3: the batched solve (reuse the Evaluator's cached jit via a
    # full VO run minus BA — cheapest honest split: run VO-only pipeline)
    print("== stage 3/4: VO-only run (detect + solve + chain) ==")
    cfg2 = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "preloaded", "name": "r15"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 1000, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True},
        precision="bfloat16",
        output_dir="/tmp/kbt_r15b")
    ev2 = Evaluator(cfg2)
    _, dt_vo = t2("ev.run() [VO only, warm]", ev2.run)
    print(f"  -> VO frames/s: {FRAMES / dt_vo:.2f}")
    print(f"  -> solve+chain share (vo_run - detect): "
          f"{(dt_vo - dt_det) * 1e3:.1f} ms")
    print(f"  -> BA share (vo_ba_run - vo_run): "
          f"{(dt_full - dt_vo) * 1e3:.1f} ms")

    # stage 5: BA split. Re-run the pieces the way _run_vo_pipelined does.
    print("== stage 5: BA refine split ==")
    from keypoint_bench_tpu.tasks.vo_ba import (build_ba_problem,
                                                chain_tracks, refine_window)
    from keypoint_bench_tpu.ba.gauss_newton import (BAProblem, ba_solve,
                                                    reprojection_errors)

    _, descs_s, kpts_s, valids_s = ev.detect_many(raw, sparse=True)
    n = len(raw)
    from keypoint_bench_tpu.ops.matching import mutual_nn_match

    def shift1(x):
        return jnp.concatenate([x[:1], x[:-1]])

    def match_batch(kpts, valids, descs):
        k0s, v0s, d0s = shift1(kpts), shift1(valids), shift1(descs)
        def pair(v0, d0, v1, d1):
            return mutual_nn_match(d0, d1, v0, v1, 5.0)
        return jax.vmap(pair)(v0s, d0s, valids, descs)
    mj = jax.jit(match_batch)
    nn01s, mok = jax.block_until_ready(mj(kpts_s, valids_s, descs_s))
    nn01s_n, mok_n = np.asarray(nn01s), np.asarray(mok)

    tracks, _ = t2("chain_tracks (host)",
                   lambda: chain_tracks(nn01s_n, mok_n))
    print(f"   tracks: {len(tracks)}")
    # plausible chained poses: identity-ish
    R_w2c = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    t_w2c = np.zeros((n, 3), np.float32)
    t_w2c[:, 0] = np.arange(n) * 0.1
    fx = float(items[0]["fx"]); cx = float(items[0]["cx"])
    cy = float(items[0]["cy"]); fy = float(items[0]["fy"])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    scale_px = np.array([SIZE - 1.0, SIZE - 1.0])
    kpts_px = np.asarray(kpts_s)[:, :, :2] * scale_px

    built, _ = t2("build_ba_problem (host numpy)",
                  lambda: build_ba_problem(kpts_px, tracks, R_w2c, t_w2c, K))
    if built is None:
        print("   build_ba_problem -> None (degenerate poses); "
              "skipping solve split")
    else:
        prob, n_pts = built
        print(f"   obs bucket: {prob.uv.shape[0]}  pts bucket: "
              f"{prob.points.shape[0]} (real {n_pts})")
        t2("reprojection_errors (eager dispatches)",
           lambda: jax.block_until_ready(reprojection_errors(prob)))
        t2("ba_solve warm (iters=8)",
           lambda: jax.block_until_ready(
               ba_solve(prob, iters=8, damping=1e-2, huber_delta=2.0)[0]))
        t2("refine_window full (single-chip)",
           lambda: refine_window(kpts_px, tracks, R_w2c, t_w2c, K))


if __name__ == "__main__":
    main()
