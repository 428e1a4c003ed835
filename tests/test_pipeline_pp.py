"""Device-staged pipeline parallelism (parallel/pipeline.py).

Exactness: the 2-stage pipeline must match the sequential
stage1(stage0(x)) map bit-for-bit (same per-microbatch programs, only the
device placement differs). Plus the concrete extract pipeline vs the
single-device detection path.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.ops.detect import DetectParams, detection_batch
from keypoint_bench_tpu.parallel.pipeline import (make_stage_mesh,
                                                  pipeline_extract,
                                                  two_stage_pipeline)
from keypoint_bench_tpu.weights import load_params


def test_two_stage_pipeline_matches_sequential():
    mesh = make_stage_mesh()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(5, 3, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    def stage0(x):
        return jnp.tanh(x @ w), jnp.sum(x, axis=-1)

    def stage1(act):
        h, s = act
        return {"y": h * 2.0 + s[:, None], "m": s > 0.0}

    got = two_stage_pipeline(mesh, stage0, stage1, xs)
    want = jax.lax.map(lambda x: stage1(stage0(x)), xs)
    np.testing.assert_array_equal(np.asarray(got["y"]),
                                  np.asarray(want["y"]))
    np.testing.assert_array_equal(np.asarray(got["m"]),
                                  np.asarray(want["m"]))


def test_pipeline_extract_matches_single_device():
    mesh = make_stage_mesh()
    model_fn = get_model("Alike")
    params = load_params("Alike")
    dp = DetectParams(nms_dist=4, border_dist=4, top_k=64, max_nms_iter=8)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((4, 64, 64, 3), np.float32))

    kpts, valid = pipeline_extract(mesh, model_fn, params, dp, imgs,
                                   n_micro=2)
    score, _ = jax.jit(lambda im: model_fn(params, im))(imgs)
    kref, vref = detection_batch(score[..., 0], dp)
    np.testing.assert_allclose(np.asarray(kpts), np.asarray(kref),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(vref))


def test_pp_vs_dp_measured_comparison():
    """The PARITY.md §2.7 claim, measured: for independent microbatches DP
    beats the 2-stage pipeline (bubble + inter-stage transfer), on the same
    2 devices. Asserts the direction with generous slack (the virtual-CPU
    measurement in PARITY.md shows ~4.4x; we only require DP not to LOSE by
    more than 1.5x, so scheduler noise can't flake the test)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from keypoint_bench_tpu.parallel.mesh import make_mesh

    mesh_pp = make_stage_mesh()
    model_fn = get_model("Alike")
    params = load_params("Alike")
    dp = DetectParams(nms_dist=4, border_dist=4, top_k=64, max_nms_iter=8)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((8, 64, 64, 3), np.float32))

    def run_pp():
        return jax.block_until_ready(
            pipeline_extract(mesh_pp, model_fn, params, dp, imgs, n_micro=4))

    mesh_dp = make_mesh(n_data=2, devices=jax.devices()[:2])
    sharded = jax.device_put(
        imgs, NamedSharding(mesh_dp, P("data", None, None, None)))

    @jax.jit
    def dp_step(im):
        score, _ = model_fn(params, im)
        return detection_batch(score[..., 0], dp)

    def run_dp():
        return jax.block_until_ready(dp_step(sharded))

    run_pp(), run_dp()  # compile
    t0 = time.perf_counter(); run_pp(); t_pp = time.perf_counter() - t0
    t0 = time.perf_counter(); run_dp(); t_dp = time.perf_counter() - t0
    # direction guard for the PARITY.md §2.7 claim (measured ~4.4x there;
    # 1.5x slack absorbs CI scheduler noise on the virtual CPU devices)
    assert t_dp < t_pp * 1.5, (t_dp, t_pp)
