"""Ring-attention (sequence-parallel) LightGlue equals the dense forward."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models.lightglue import lightglue_forward
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.lightglue_sp import lightglue_forward_sp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "lightglue.npz")


def test_sp_matches_dense():
    if not os.path.exists(GOLDEN):
        pytest.skip("no lightglue golden")
    g = np.load(GOLDEN)
    params = {k[len("param:"):]: jnp.asarray(g[k])
              for k in g.files if k.startswith("param:")}
    m = g["kpts0"].shape[1]   # 64
    n = g["kpts1"].shape[1]   # 80
    args = (jnp.asarray(g["kpts0"][0]), jnp.ones(m, bool),
            jnp.asarray(g["desc0"][0]), jnp.asarray(g["kpts1"][0]),
            jnp.ones(n, bool), jnp.asarray(g["desc1"][0]))
    m0_d, ms_d, ok_d = lightglue_forward(params, *args)

    mesh = make_mesh(n_data=8)   # 8 | 64 and 8 | 80
    m0_s, ms_s, ok_s = lightglue_forward_sp(mesh, params, *args)

    assert (np.asarray(m0_s) == np.asarray(m0_d)).all()
    np.testing.assert_allclose(np.asarray(ms_s), np.asarray(ms_d), atol=2e-3)
