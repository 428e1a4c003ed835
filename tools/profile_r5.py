"""Micro-profile of mutual_nn_match internals at K=1000, B=96 pairs.

Run: timeout 580 python tools/profile_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keypoint_bench_tpu.ops.matching import mutual_nn_match, pairwise_sqdist

K = 1000
B = int(os.environ.get("B", "96"))
rng = np.random.default_rng(0)
d0 = jnp.asarray(rng.normal(size=(B, K, 64)).astype(np.float32))
d1 = jnp.asarray(rng.normal(size=(B, K, 64)).astype(np.float32))
v0 = jnp.ones((B, K), bool)
v1 = jnp.ones((B, K), bool)


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms total, {dt / B * 1e6:.1f} us/pair",
          flush=True)
    return dt


timeit("sqdist", jax.vmap(pairwise_sqdist), d0, d1)
timeit("sqdist bf16", jax.vmap(lambda a, b: pairwise_sqdist(
    a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))), d0, d1)


def dist_masked(a, b, va, vb):
    d2 = pairwise_sqdist(a, b)
    return jnp.where(va[:, None] & vb[None, :], d2, 1e30)


timeit("sqdist+mask", jax.vmap(dist_masked), d0, d1, v0, v1)
timeit("+argmin ax1", jax.vmap(
    lambda a, b, va, vb: jnp.argmin(dist_masked(a, b, va, vb), axis=1)),
    d0, d1, v0, v1)
timeit("+argmin ax0", jax.vmap(
    lambda a, b, va, vb: jnp.argmin(dist_masked(a, b, va, vb), axis=0)),
    d0, d1, v0, v1)
timeit("+min ax1", jax.vmap(
    lambda a, b, va, vb: jnp.min(dist_masked(a, b, va, vb), axis=1)),
    d0, d1, v0, v1)
timeit("+min ax0", jax.vmap(
    lambda a, b, va, vb: jnp.min(dist_masked(a, b, va, vb), axis=0)),
    d0, d1, v0, v1)


def argmin_rows_reduce(d2):
    """first-argmin via min + masked-iota min (no variadic reduce)."""
    m, n = d2.shape
    rowmin = jnp.min(d2, axis=1)
    eq = d2 == rowmin[:, None]
    col = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return jnp.min(jnp.where(eq, col, n), axis=1), rowmin


timeit("+reduce-argmin ax1", jax.vmap(
    lambda a, b, va, vb: argmin_rows_reduce(dist_masked(a, b, va, vb))),
    d0, d1, v0, v1)

timeit("mutual_nn_match (current)", jax.vmap(
    lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0)),
    d0, d1, v0, v1)


def mutual_reduce(a, b, va, vb, max_distance=5.0):
    d2 = dist_masked(a, b, va, vb)
    m, n = d2.shape
    rowmin = jnp.min(d2, axis=1)
    colmin = jnp.min(d2, axis=0)
    col = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    row = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    eq1 = d2 == rowmin[:, None]
    nn01 = jnp.min(jnp.where(eq1, col, n), axis=1)
    eq0 = d2 == colmin[None, :]
    nn10 = jnp.min(jnp.where(eq0, row, m), axis=0)
    # mutual: the (i, nn01[i]) cell is also its column's first argmin
    onehot = col == nn01[:, None]
    mutual = jnp.any(onehot & (nn10[None, :] == row), axis=1)
    ok = mutual & va & (rowmin < max_distance ** 2) & (rowmin < 1e30)
    return nn01, ok


t_new = timeit("mutual_reduce (candidate)", jax.vmap(mutual_reduce),
               d0, d1, v0, v1)

# exactness vs current
a, b = np.asarray(d0[0]), np.asarray(d1[0])
r_cur = jax.jit(lambda a, b, va, vb: mutual_nn_match(a, b, va, vb, 5.0))(
    d0[0], d1[0], v0[0], v1[0])
r_new = jax.jit(lambda a, b, va, vb: mutual_reduce(a, b, va, vb, 5.0))(
    d0[0], d1[0], v0[0], v1[0])
print("nn01 equal:", bool(jnp.all(r_cur[0] == r_new[0])),
      "ok equal:", bool(jnp.all(r_cur[1] == r_new[1])))
