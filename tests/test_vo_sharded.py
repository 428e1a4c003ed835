"""Sequence-sharded VO (halo exchange of boundary frames) equals the
unsharded vmapped solves on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.datasets.synthetic import SyntheticSplatSequenceDataset
from keypoint_bench_tpu.ops.matching import brute_force_match
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.vo_sharded import sharded_vo_pair_solves
from keypoint_bench_tpu.runner import EvalConfig, Evaluator
from keypoint_bench_tpu.tasks.vo import vo_pair_pose


def test_sharded_vo_matches_unsharded():
    t_frames = 8
    ds = SyntheticSplatSequenceDataset(t_frames, 256)
    ev = Evaluator(EvalConfig(
        model_type="Alike", task_type="visual_odometer",
        data_params={"type": "synthetic_splat_sequence"},
        extractor_params={"nms_dist": 4, "threshold": 0, "border_dist": 8,
                          "top_k": 500, "min_score": 0.0},
        output_dir="/tmp/kbt_vosh"))
    kpts, valids, descs = [], [], []
    for i in range(t_frames):
        img = np.asarray(ds[i]["image0"], np.float32)
        s, d, k, v = ev.detect(img)
        kpts.append(k); valids.append(v); descs.append(d)
    kpts = jnp.stack(kpts); valids = jnp.stack(valids); descs = jnp.stack(descs)
    keys = jax.random.split(jax.random.key(0), t_frames)
    fx, cx, cy = ds[0]["fx"], ds[0]["cx"], ds[0]["cy"]
    h = w = 256

    mesh = make_mesh(n_data=8)
    R_s, t_s, ok_s = sharded_vo_pair_solves(mesh, kpts, valids, descs, keys,
                                            fx, cx, cy, w, h, n_hyp=4096)

    # unsharded reference: identical math without the mesh
    def solve(k0, v0, d0, k1, v1, d1, key):
        m0, m1, ok = brute_force_match(k0, v0, k1, v1, d0, d1, 5.0)
        sp = jnp.asarray([w - 1.0, h - 1.0])
        R, t, n_in, okp = vo_pair_pose(m0[:, 0:2] * sp, m1[:, 0:2] * sp, ok,
                                       jnp.asarray(fx), jnp.asarray(cx),
                                       jnp.asarray(cy), key, n_hyp=4096)
        return R, t, okp

    prev = [max(0, i - 1) for i in range(t_frames)]
    R_u, t_u, ok_u = jax.vmap(solve)(
        kpts[np.array(prev)], valids[np.array(prev)], descs[np.array(prev)],
        kpts, valids, descs, keys)

    # RANSAC consensus near-ties flip under different compilation contexts,
    # so compare both paths against the GT relative poses rather than
    # bitwise: each must recover the translation direction of every real
    # pair within a tight angular bound
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_u))

    def angular_errors(t_est):
        errs = []
        for i in range(1, t_frames):
            T_rel = np.linalg.inv(ds.poses_cam[i - 1]) @ ds.poses_cam[i]
            # cam(i)-from-cam(i-1): X_i = R X_{i-1} + t
            T_rel = ds.poses_cam[i] @ np.linalg.inv(ds.poses_cam[i - 1])
            gt = T_rel[:3, 3]
            gt = gt / np.linalg.norm(gt)
            e = t_est[i] / max(np.linalg.norm(t_est[i]), 1e-9)
            cos = abs(float(np.dot(e, gt)))
            errs.append(np.degrees(np.arccos(min(cos, 1.0))))
        return np.asarray(errs)

    ok = np.asarray(ok_u)[1:]
    err_s = angular_errors(np.asarray(t_s))[ok]
    err_u = angular_errors(np.asarray(t_u))[ok]
    # blob scenes at this baseline give ~10-15 deg translation direction
    # noise; what matters here is that the sharded path behaves like the
    # unsharded one
    assert np.median(err_s) < 15.0, err_s
    assert np.median(err_u) < 15.0, err_u
    assert abs(np.median(err_s) - np.median(err_u)) < 5.0