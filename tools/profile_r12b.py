"""Round-4: A/B the width-s2d conv1 + pool-friendly channel order.

Baseline (tools/profile_r12.py, pre-change): fwd total 190.9 us/map with
conv1 49.1 / pool 18.3. This times the full alike_s2d_feats_cm forward
under both stem impls (ws2d vs w8) with the permuted pool in both, plus
the first two stage cuts (conv1 / x1b) for the marginal attribution.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models import alike_s2d as a2
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.weights import load_params

BATCH = int(os.environ.get("R12_BATCH", "96"))
SIZE = int(os.environ.get("R12_SIZE", "512"))
params = cast_params_bf16(load_params("Alike_s2d"))


def scalarize(t):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(t))


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def conv1_only(image):
    p = params
    b = a2._B
    wk = p["block1.conv1.weight_ws2d"].astype(jnp.bfloat16)
    nb, hh, ww, ci_ = image.shape
    imgw = image.reshape(nb, hh, ww // b, b * ci_)
    dn = jax.lax.conv_dimension_numbers(imgw.shape, wk.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        imgw.astype(wk.dtype), wk, (b, 1), [(1, b - 1), (1, 1)],
        dimension_numbers=dn, precision=c._CONV_PRECISION[0],
        preferred_element_type=jnp.bfloat16)


def main():
    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                 for _ in range(BATCH)])).astype(jnp.bfloat16)

    f = jax.jit(lambda a: scalarize(conv1_only(a)))
    t = timeit(f, imgs)
    print(f"conv1 ws2d only: {t / BATCH * 1e6:6.1f} us/map  (was 49.1)")

    saved = a2._STEM_IMPL[0]
    for impl in ("ws2d", "w8"):
        a2.set_stem_impl(impl)
        f = jax.jit(lambda a, i=impl: scalarize(
            a2.alike_s2d_feats_cm(params, a)))
        t = timeit(f, imgs)
        print(f"feats_cm [{impl} + permuted pool]: "
              f"{t / BATCH * 1e6:6.1f} us/map  (was 190.9)")
    a2.set_stem_impl(saved)


if __name__ == "__main__":
    main()
