"""Round-5: bisect the pipelined-VO batched pair-solve (1.97 s warm for 32
pairs = 62 ms/pair — the VO wall once detect runs uint8-prestaged and the
BA gate/buckets are fixed).

Cumulative in-graph prefixes of the vmapped solve (the only trustworthy
method through the axon dispatch tunnel, PERF.md round 2b):
  p1 match            mutual-NN match (bf16 descs)
  p2 gather           matched kpt gather + pixel scaling + normalize
  p3 hyps             + 4096 8-point hypothesis solves (smallest_eigvec)
  p4 score            + Sampson scoring of all hyps + argmax
  p5 refit            + 3-round LO refit (exact Jacobi eigensolver)
  p6 pose             + recover_pose (triangulate 4 candidates) == full
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("R16_FRAMES", "32"))
SIZE = int(os.environ.get("R16_SIZE", "512"))
NHYP = int(os.environ.get("R16_NHYP", "4096"))


def main():
    import jax
    import jax.numpy as jnp
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator
    from keypoint_bench_tpu.datasets.registry import (get_dataset,
                                                      register_preloaded)
    from keypoint_bench_tpu.ops.matching import mutual_nn_match
    from keypoint_bench_tpu.geometry.ransac import (_essential_project,
                                                    _essential_project_hyp,
                                                    _sample_minimal,
                                                    _sampson,
                                                    _solve_eightpoint,
                                                    recover_pose)

    base = get_dataset({"type": "synthetic_sequence", "num_frames": FRAMES,
                        "image_size": SIZE})
    items = [base[i] for i in range(len(base))]
    register_preloaded("r16", items)
    cfg = EvalConfig(
        model_type="Alike_s2d", task_type="visual_odometer",
        data_params={"type": "preloaded", "name": "r16"},
        extractor_params={"nms_dist": 6, "threshold": 0, "border_dist": 8,
                          "top_k": 1000, "min_score": 0.0},
        matcher_params={"type": "brute_force",
                        "brute_force_params": {"max_distance": 5.0}},
        task_params={"pipelined": True},
        precision="bfloat16", output_dir="/tmp/kbt_r16")
    ev = Evaluator(cfg)
    raw = [np.asarray(it["image0"], np.float32) for it in items]
    _, descs_s, kpts_s, valids_s = ev.detect_many(raw, sparse=True)
    for x in (descs_s, kpts_s, valids_s):
        x.block_until_ready()

    fx = jnp.asarray(float(items[0]["fx"]))
    cx = jnp.asarray(float(items[0]["cx"]))
    cy = jnp.asarray(float(items[0]["cy"]))
    pp = jnp.stack([cx, cy])
    scale_px = jnp.asarray([SIZE - 1.0, SIZE - 1.0])
    thresh = 1.0 / fx
    keys = jax.random.split(jax.random.key(0), FRAMES)

    def shift1(x):
        return jnp.concatenate([x[:1], x[:-1]])

    def stage(upto):
        def pair(k0, v0, d0, k1, v1, d1, key):
            nn01, ok = mutual_nn_match(d0, d1, v0, v1, 5.0)
            if upto == 1:
                return jnp.sum(ok)
            m1 = k1[nn01]
            p0n = (k0[:, 0:2] * scale_px - pp[None]) / fx
            p1n = (m1[:, 0:2] * scale_px - pp[None]) / fx
            if upto == 2:
                return jnp.sum(p0n) + jnp.sum(p1n)
            idx = _sample_minimal(key, ok, NHYP, 8)
            if upto == 25:
                return jnp.sum(idx).astype(jnp.float32)
            if upto in (26, 27):
                from keypoint_bench_tpu.geometry.smallmat import \
                    smallest_eigvec
                from keypoint_bench_tpu.geometry.ransac import _null9

                def design(i8):
                    q0, q1 = p0n[i8], p1n[i8]
                    x0, y0 = q0[:, 0], q0[:, 1]
                    x1, y1 = q1[:, 0], q1[:, 1]
                    o = jnp.ones_like(x0)
                    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0,
                                   y1, x0, y0, o], axis=1)
                    return jnp.matmul(A.T, A,
                                      precision=jax.lax.Precision.HIGHEST)
                M = jax.vmap(design)(idx)
                if upto == 26:
                    return jnp.sum(M)
                return jnp.sum(jax.vmap(smallest_eigvec)(M))
            Es = jax.vmap(lambda i8: _essential_project_hyp(
                _solve_eightpoint(p0n[i8], p1n[i8], jnp.ones(8))))(idx)
            if upto == 3:
                return jnp.sum(Es)
            res = jax.vmap(lambda E: _sampson(E, p0n, p1n))(Es)
            inl = (res < thresh) & ok[None, :]
            counts = jnp.sum(inl, axis=1)
            best = jnp.argmax(counts)
            if upto == 4:
                return counts[best].astype(jnp.float32)
            def refit(_, carry):
                w, _E = carry
                E = _essential_project(
                    _solve_eightpoint(p0n, p1n, w, exact=True))
                w = ((_sampson(E, p0n, p1n) < thresh)
                     & ok).astype(jnp.float32)
                return w, E
            w0 = inl[best].astype(jnp.float32)
            w, E = jax.lax.fori_loop(0, 3, refit, (w0, Es[best]))
            final_inl = (_sampson(E, p0n, p1n) < thresh) & ok
            if upto == 5:
                return jnp.sum(final_inl).astype(jnp.float32) + jnp.sum(E)
            R, t, pm, n_in = recover_pose(E, p0n, p1n, final_inl)
            return jnp.sum(R) + jnp.sum(t) + n_in.astype(jnp.float32)

        def batched(kpts, valids, descs, keys):
            k0s, v0s, d0s = shift1(kpts), shift1(valids), shift1(descs)
            return jnp.sum(jax.vmap(pair)(k0s, v0s, d0s,
                                          kpts, valids, descs, keys))
        return jax.jit(batched)

    stages = [(1, "match"), (2, "gather"), (25, "sample"), (26, "design"),
              (27, "eig"), (3, "hyps"), (4, "score"), (5, "refit"),
              (6, "pose")]
    prev = 0.0
    for i, nm in stages:
        f = stage(i)
        r = f(kpts_s, valids_s, descs_s, keys)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(kpts_s, valids_s, descs_s, keys))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"p{i} {nm:8s} cumulative {dt * 1e3:8.1f} ms   "
              f"marginal {(dt - prev) * 1e3:8.1f} ms "
              f"({(dt - prev) / FRAMES * 1e3:6.2f} ms/pair)")
        prev = dt


if __name__ == "__main__":
    main()
