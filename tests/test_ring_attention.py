"""Ring (sequence-parallel) attention equals dense attention on the 8-device
CPU mesh."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.ring_attention import (ring_attention,
                                                        dense_attention)


def test_ring_equals_dense():
    rng = np.random.default_rng(0)
    h, nq, nk, d = 4, 64, 128, 32
    q = jnp.asarray(rng.normal(0, 1, (h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (h, nk, d)).astype(np.float32))
    valid = np.ones(nk, bool)
    valid[120:] = False  # padded tail
    valid = jnp.asarray(valid)

    mesh = make_mesh(n_data=8)
    out_ring = ring_attention(mesh, q, k, v, valid)
    out_dense = dense_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_dense),
                               atol=1e-5)


def test_ring_fully_masked_shard():
    """A shard whose entire kv chunk is invalid must not corrupt results."""
    rng = np.random.default_rng(1)
    h, nq, nk, d = 2, 16, 64, 16
    q = jnp.asarray(rng.normal(0, 1, (h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (h, nk, d)).astype(np.float32))
    valid = np.ones(nk, bool)
    valid[: nk // 8] = False   # shard 0's whole chunk invalid
    valid = jnp.asarray(valid)
    mesh = make_mesh(n_data=8)
    out_ring = ring_attention(mesh, q, k, v, valid)
    out_dense = dense_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_dense),
                               atol=1e-5)
