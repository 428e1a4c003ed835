"""Fused Pallas mutual-NN kernel vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.ops.matching import mutual_nn_match
from keypoint_bench_tpu.ops.pallas_match import pallas_mutual_nn


def test_pallas_mutual_nn_matches_reference():
    rng = np.random.default_rng(0)
    m, n, d = 300, 280, 64
    d0 = rng.normal(0, 1, (m, d)).astype(np.float32)
    d1 = np.concatenate([d0[:200] + 0.01 * rng.normal(0, 1, (200, d)),
                         rng.normal(0, 1, (n - 200, d))]).astype(np.float32)
    v0 = np.ones(m, bool); v0[290:] = False
    v1 = np.ones(n, bool); v1[0] = False

    ref_nn, ref_ok = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1),
                                     jnp.asarray(v0), jnp.asarray(v1), 5.0)
    nn, ok = pallas_mutual_nn(jnp.asarray(d0), jnp.asarray(d1),
                              jnp.asarray(v0), jnp.asarray(v1), 5.0,
                              tile=128, interpret=True)
    ok = np.asarray(ok); ref_ok = np.asarray(ref_ok)
    np.testing.assert_array_equal(ok, ref_ok)
    np.testing.assert_array_equal(np.asarray(nn)[ok], np.asarray(ref_nn)[ok])
