"""Distributed (landmark-partitioned, psum-reduced Schur) BA equals the
single-device solver on the 8-device CPU mesh."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.ba import BAProblem, ba_solve, reprojection_errors
from keypoint_bench_tpu.ba.distributed import (ba_solve_distributed,
                                               gather_points, partition_problem)
from keypoint_bench_tpu.parallel.mesh import make_mesh
from tests.test_ba import make_problem


def test_distributed_matches_single_device():
    prob, truth = make_problem(C=5, P=48, pose_noise=0.02, pt_noise=0.05,
                               seed=3)
    R1, t1, p1, err1 = ba_solve(prob, iters=8)

    mesh = make_mesh(n_data=8)
    R8, t8, pts_sharded, meta = ba_solve_distributed(mesh, prob, iters=8)
    p8 = gather_points(pts_sharded, meta, prob.points.shape[0])

    # rotations are gauge-free given cam0 fixed -> must match tightly;
    # translations/points carry the monocular scale gauge, so compare up to
    # a global scale
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=1e-3)
    s = float(np.linalg.norm(np.asarray(t1)[1]) /
              max(np.linalg.norm(np.asarray(t8)[1]), 1e-9))
    np.testing.assert_allclose(np.asarray(t8) * s, np.asarray(t1), atol=0.03)

    final = BAProblem(R8, t8, jnp.asarray(p8), prob.cam_idx, prob.pt_idx,
                      prob.uv, prob.mask, prob.K)
    err8 = float(jnp.sum(reprojection_errors(final))
                 / jnp.sum(prob.mask))
    assert err8 < 0.05, err8  # both solutions explain the observations


def test_partition_roundtrip():
    prob, _ = make_problem(C=3, P=17, seed=4)
    (s_pts, s_cam, s_pt, s_uv, s_mask), meta = partition_problem(prob, 4)
    back = gather_points(s_pts, meta, 17)
    np.testing.assert_allclose(back, np.asarray(prob.points), atol=0)
    assert int(np.asarray(s_mask).sum()) == int(np.asarray(prob.mask).sum())
