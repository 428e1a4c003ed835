"""Tensor-parallel LightGlue (head sharding over the 'model' mesh axis) must
reproduce the dense forward exactly."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models.lightglue import lightglue_forward
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.lightglue_tp import (
    shard_lightglue_params, lightglue_forward_tp)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "lightglue.npz")


@pytest.mark.parametrize("n_model", [2, 4])
def test_tp_matches_dense(n_model):
    if not os.path.exists(GOLDEN):
        pytest.skip("no lightglue golden")
    g = np.load(GOLDEN)
    params = {k[len("param:"):]: jnp.asarray(g[k])
              for k in g.files if k.startswith("param:")}
    m = g["kpts0"].shape[1]
    n = g["kpts1"].shape[1]
    args = (jnp.asarray(g["kpts0"][0]), jnp.ones(m, bool),
            jnp.asarray(g["desc0"][0]), jnp.asarray(g["kpts1"][0]),
            jnp.ones(n, bool), jnp.asarray(g["desc1"][0]))

    m0_d, ms_d, ok_d = lightglue_forward(params, *args)

    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)
    sp = shard_lightglue_params(params, n_model)
    m0_t, ms_t, ok_t = lightglue_forward_tp(mesh, sp, *args)

    assert (np.asarray(m0_t) == np.asarray(m0_d)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(ms_t), np.asarray(ms_d), atol=1e-3)
