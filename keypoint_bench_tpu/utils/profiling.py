"""Profiling utilities — replaces the reference's thop.profile + wall-clock
loops scattered in model __main__ blocks (e.g. models/ALike.py:167-191,
models/KeyNet.py:135-164) with XLA cost analysis and a uniform latency
harness; device traces via jax.profiler.
"""
from __future__ import annotations

import time


def model_cost(model_name: str, input_shape=(1, 512, 512, 3),
               weights_dir: str | None = None) -> dict:
    """Compile the model forward and return XLA's flops/bytes estimates plus
    parameter count."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypoint_bench_tpu.models import get_model
    from keypoint_bench_tpu.weights import load_params

    model_fn = get_model(model_name)
    params = load_params(model_name, weights_dir)

    lowered = jax.jit(lambda img: model_fn(params, img)).lower(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    cost = lowered.compile().cost_analysis()
    n_params = int(sum(np.prod(v.shape) for v in params.values()))
    return {
        "model": model_name,
        "gflops": float(cost.get("flops", 0.0)) / 1e9,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "params_k": n_params / 1e3,
    }


def measure_latency(fn, args, iters: int = 20, warmup: int = 3) -> dict:
    """Wall-clock latency of a jitted fn (seconds/iter, iters/s)."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"seconds_per_iter": dt, "iters_per_second": 1.0 / dt}


def trace(fn, args, log_dir: str = "/tmp/kbt_trace"):
    """Capture a jax.profiler device trace around one invocation."""
    import jax
    with jax.profiler.trace(log_dir):
        jax.block_until_ready(fn(*args))
    return log_dir
