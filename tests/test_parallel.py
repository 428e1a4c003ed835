"""Sharded evaluation on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.ops.detect import DetectParams
from keypoint_bench_tpu.parallel.mesh import make_mesh
from keypoint_bench_tpu.parallel.evaluate import sharded_eval_step
from keypoint_bench_tpu.weights import load_params


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")


def test_sharded_eval_matches_single_device():
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    model_fn = get_model("Alike")
    params = load_params("Alike")
    dp = DetectParams(nms_dist=4, border_dist=4, top_k=64, max_nms_iter=8)

    rng = np.random.default_rng(0)
    b, s = n, 64
    imgs0 = jnp.asarray(rng.random((b, s, s, 3), np.float32))
    # img1 = img0 shifted one pixel -> nontrivial repeatability
    imgs1 = jnp.roll(imgs0, 1, axis=2)
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 1.0
    Hs = jnp.tile(jnp.asarray(H)[None], (b, 1, 1))
    Hinvs = jnp.tile(jnp.asarray(np.linalg.inv(H))[None], (b, 1, 1))
    sizes = jnp.full((b, 2), float(s))
    scales = jnp.full((b,), float(s))
    keys = jax.random.split(jax.random.key(0), b)

    mesh8 = make_mesh(n_data=8)
    step8 = sharded_eval_step(mesh8, model_fn, params, dp)
    with mesh8:
        out8 = step8(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)

    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])
    step1 = sharded_eval_step(mesh1, model_fn, params, dp)
    with mesh1:
        out1 = step1(imgs0, imgs1, Hs, Hinvs, sizes, scales, keys)

    for k in out8:
        np.testing.assert_allclose(np.asarray(out8[k]), np.asarray(out1[k]),
                                   rtol=1e-4, err_msg=k, equal_nan=True)
    assert float(np.mean(np.asarray(out8["repeatability"]))) > 0.1


def test_dryrun_multichip_entry():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(jnp.sum(out[2])))
