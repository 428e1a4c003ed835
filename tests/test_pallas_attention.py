"""Fused Pallas attention (ops/pallas_attention.py) vs the dense masked
softmax path: numeric parity on raw attention and end-to-end identical
LightGlue matches (interpret mode — the kernel math, not Mosaic codegen)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.ops.pallas_attention import fused_attention
from keypoint_bench_tpu.parallel.ring_attention import dense_attention


@pytest.mark.parametrize("h,n,m,dh", [(4, 512, 512, 64),
                                      (4, 300, 420, 64),
                                      (2, 128, 2048, 32)])
def test_fused_attention_matches_dense(h, n, m, dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (h, m, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (h, m, dh)), jnp.float32)
    valid = jnp.asarray(rng.random(m) < 0.8)
    ours = fused_attention(q, k, v, valid, interpret=True)
    ref = dense_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_all_invalid_rows_match_dense():
    """All-masked kv must degrade to the same uniform distribution as the
    dense path (same -1e9 constant), not NaN."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (2, 64, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (2, 96, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (2, 96, 32)), jnp.float32)
    valid = jnp.zeros(96, bool)
    ours = np.asarray(fused_attention(q, k, v, valid, interpret=True))
    ref = np.asarray(dense_attention(q, k, v, valid))
    assert np.isfinite(ours).all()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fused_attention_custom_scale():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(0, 1, (1, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (1, 128, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (1, 128, 64)), jnp.float32)
    valid = jnp.ones(128, bool)
    ours = fused_attention(q, k, v, valid, scale=1.0, interpret=True)
    sim = jnp.einsum("hid,hjd->hij", q, k)
    ref = jnp.einsum("hij,hjd->hid", jax.nn.softmax(sim, axis=-1), v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lightglue_fused_equals_dense():
    """Full 9-layer LightGlue forward with the fused kernel: identical match
    indices/mask and near-identical scores vs the dense path (the VERDICT
    item-6 K=512 parity gate)."""
    import os
    from keypoint_bench_tpu.models.lightglue import lightglue_forward

    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden", "lightglue.npz")
    if not os.path.exists(golden):
        pytest.skip("lightglue golden fixture missing")
    g = np.load(golden)
    params = {k[len("param:"):]: jnp.asarray(g[k]) for k in g.files
              if k.startswith("param:")}
    rng = np.random.default_rng(3)
    K = 512
    kpts0 = jnp.asarray(rng.uniform(0, 511, (K, 2)), jnp.float32)
    kpts1 = jnp.asarray(rng.uniform(0, 511, (K, 2)), jnp.float32)
    d0 = jnp.asarray(rng.normal(0, 1, (K, 256)), jnp.float32)
    d1 = jnp.asarray(rng.normal(0, 1, (K, 256)), jnp.float32)
    v0 = jnp.asarray(rng.random(K) < 0.9)
    v1 = jnp.asarray(rng.random(K) < 0.9)

    m0_d, ms_d, ok_d = lightglue_forward(params, kpts0, v0, d0, kpts1, v1,
                                         d1, attn="dense")
    m0_f, ms_f, ok_f = lightglue_forward(params, kpts0, v0, d0, kpts1, v1,
                                         d1, attn="fused_interpret")
    assert np.array_equal(np.asarray(ok_d), np.asarray(ok_f))
    assert np.array_equal(np.asarray(m0_d), np.asarray(m0_f))
    np.testing.assert_allclose(np.asarray(ms_d), np.asarray(ms_f),
                               rtol=1e-4, atol=1e-4)
