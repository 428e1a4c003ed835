"""Round-5 probe: host-side s2d input (blocked [B,128,128,48]) vs raw image
for the full cm forward and for conv1 alone, at bench conditions (512^2,
batch 96, bf16). Also serves as the round-5 compiler-watchlist probe for
conv1's XLA lowering (jax/jaxlib recorded in the output)."""
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

from keypoint_bench_tpu.models.alike_s2d import (alike_s2d_feats_cm,
                                                 host_s2d_images)
from keypoint_bench_tpu.models.common import cast_params_bf16
from keypoint_bench_tpu.weights import load_params

BATCH = int(os.environ.get("R14_BATCH", "96"))
SIZE = int(os.environ.get("R14_SIZE", "512"))
params = cast_params_bf16(load_params("Alike_s2d"))


def scalarize(t):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(t))


def timeit(f, *a, iters=20):
    r = f(*a); jax.block_until_ready(r)
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def conv1_raw(img):
    p = params
    w8 = p["block1.conv1.weight_s2d8"].astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(img.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        img.astype(jnp.bfloat16), w8, (4, 4), [(1, 3), (1, 3)],
        dimension_numbers=dn, preferred_element_type=jnp.bfloat16)


def conv1_blk(blk):
    p = params
    wk = p["block1.conv1.weight_s2d"].astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(blk.shape, wk.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        blk.astype(jnp.bfloat16), wk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.bfloat16)


def main():
    import jaxlib
    print(f"jax {jax.__version__} jaxlib {jaxlib.__version__}", flush=True)
    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    raw_np = np.stack([_texture(SIZE, SIZE, rng) for _ in range(BATCH)])
    blk_np = host_s2d_images(raw_np)
    raw = jnp.asarray(raw_np)
    blk = jnp.asarray(blk_np)

    t = timeit(jax.jit(lambda a: jnp.sum(conv1_raw(a).astype(jnp.float32))),
               raw)
    print(f"conv1 w8 raw     : {t / BATCH * 1e6:6.1f} us/map", flush=True)
    t = timeit(jax.jit(lambda a: jnp.sum(conv1_blk(a).astype(jnp.float32))),
               blk)
    print(f"conv1 blocked    : {t / BATCH * 1e6:6.1f} us/map", flush=True)
    t = timeit(jax.jit(lambda a: scalarize(alike_s2d_feats_cm(params, a))),
               raw)
    print(f"feats_cm raw     : {t / BATCH * 1e6:6.1f} us/map", flush=True)
    t = timeit(jax.jit(lambda a: scalarize(alike_s2d_feats_cm(params, a))),
               blk)
    print(f"feats_cm blocked : {t / BATCH * 1e6:6.1f} us/map", flush=True)


if __name__ == "__main__":
    main()
