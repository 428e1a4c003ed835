"""Round-5 probe: which part of the 131k-batch 8-point hypothesis solve
costs 14.5 us/hyp (tools/profile_r16.py p3)?

Stages on synthetic [PAIRS, NHYP, ...] data (no detector in the loop):
  a gathers        p0n[i8]/p1n[i8] index gathers only
  b design         + the 9-column design products and M = A^T A (via _mm)
  b2 design-elem   + M built by unrolled elementwise sums (no matmul,
                    no [8,9] stack)
  c eig            smallest_eigvec on a precomputed [PAIRS*NHYP, 9, 9] M
  d project        _essential_project (svd3) on precomputed [..., 3, 3] E
  e full           the production solve_one vmap
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PAIRS = int(os.environ.get("PE_PAIRS", "32"))
NHYP = int(os.environ.get("PE_NHYP", "4096"))
K = int(os.environ.get("PE_K", "1000"))


def bench(label, f, *args):
    import jax
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    per = dt / (PAIRS * NHYP) * 1e6
    print(f"{label:22s} {dt * 1e3:8.1f} ms  ({per:6.2f} us/hyp)")
    return r


def main():
    import jax
    import jax.numpy as jnp
    from keypoint_bench_tpu.geometry.ransac import (_essential_project,
                                                    _solve_eightpoint)
    from keypoint_bench_tpu.geometry.smallmat import smallest_eigvec

    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(0, 0.5, (PAIRS, K, 2)), jnp.float32)
    p1 = jnp.asarray(rng.normal(0, 0.5, (PAIRS, K, 2)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, K, (PAIRS, NHYP, 8)), jnp.int32)

    @jax.jit
    def a_gather(p0, p1, idx):
        g0 = jax.vmap(lambda p, i: p[i])(p0, idx.reshape(PAIRS, -1))
        g1 = jax.vmap(lambda p, i: p[i])(p1, idx.reshape(PAIRS, -1))
        return jnp.sum(g0) + jnp.sum(g1)

    bench("a gathers", a_gather, p0, p1, idx)

    @jax.jit
    def b_design(p0, p1, idx):
        def pair(p0_, p1_, idx_):
            def one(i8):
                q0, q1 = p0_[i8], p1_[i8]
                x0, y0 = q0[:, 0], q0[:, 1]
                x1, y1 = q1[:, 0], q1[:, 1]
                o = jnp.ones_like(x0)
                A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                               x0, y0, o], axis=1)
                return jnp.matmul(A.T, A,
                                  precision=jax.lax.Precision.HIGHEST)
            return jax.vmap(one)(idx_)
        M = jax.vmap(pair)(p0, p1, idx)
        return jnp.sum(M)

    bench("b design(_mm)", b_design, p0, p1, idx)

    @jax.jit
    def b2_design_elem(p0, p1, idx):
        # gather once -> [PAIRS, NHYP, 8] coordinate vectors; build the 9
        # design columns as elementwise products; M entries via unrolled
        # sums over the 8-point axis. No [8,9] stack, no tiny matmul.
        g0 = jax.vmap(lambda p, i: p[i.reshape(-1)])(p0, idx)
        g1 = jax.vmap(lambda p, i: p[i.reshape(-1)])(p1, idx)
        g0 = g0.reshape(PAIRS, NHYP, 8, 2)
        g1 = g1.reshape(PAIRS, NHYP, 8, 2)
        x0, y0 = g0[..., 0], g0[..., 1]
        x1, y1 = g1[..., 0], g1[..., 1]
        cols = [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                jnp.ones_like(x0)]
        out = 0.0
        for i in range(9):
            for j in range(i, 9):
                out = out + jnp.sum(cols[i] * cols[j], axis=-1)
        return jnp.sum(out)

    bench("b2 design-elem", b2_design_elem, p0, p1, idx)

    M = jnp.asarray(rng.normal(0, 1, (PAIRS * NHYP, 9, 9)), jnp.float32)
    M = jnp.einsum("bij,bkj->bik", M, M)

    @jax.jit
    def c_eig(M):
        return jnp.sum(smallest_eigvec(M))

    bench("c eig", c_eig, M)

    E = jnp.asarray(rng.normal(0, 1, (PAIRS * NHYP, 3, 3)), jnp.float32)

    @jax.jit
    def d_project(E):
        return jnp.sum(jax.vmap(_essential_project)(E))

    bench("d project(svd3)", d_project, E)

    @jax.jit
    def e_full(p0, p1, idx):
        def pair(p0_, p1_, idx_):
            def one(i8):
                return _essential_project(
                    _solve_eightpoint(p0_[i8], p1_[i8], jnp.ones(8)))
            return jax.vmap(one)(idx_)
        return jnp.sum(jax.vmap(pair)(p0, p1, idx))

    bench("e full", e_full, p0, p1, idx)


def main2():
    """Sample-minimal isolation: the one p3 component main() skips."""
    import jax
    import jax.numpy as jnp
    from keypoint_bench_tpu.geometry.ransac import _sample_minimal

    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((PAIRS, K)) < 0.8)
    keys = jax.random.split(jax.random.key(0), PAIRS)

    @jax.jit
    def f(keys, mask):
        return jnp.sum(jax.vmap(
            lambda k, m: _sample_minimal(k, m, NHYP, 8))(keys, mask))
    bench("s sample_minimal", f, keys, mask)

    @jax.jit
    def g_only(keys, mask):
        def one(k, m):
            g = jax.random.gumbel(k, (NHYP, K))
            return jnp.sum(jnp.where(m[None, :], g, -jnp.inf))
        return jnp.sum(jax.vmap(one)(keys, mask))
    bench("s1 gumbel gen only", g_only, keys, mask)

    @jax.jit
    def peel_only(keys, mask):
        def one(k, m):
            # uniform bits are 1 op/value vs threefry gumbel's log chain
            g = jax.random.uniform(k, (NHYP, K))
            g = jnp.where(m[None, :], g, -jnp.inf)
            cols = jax.lax.broadcasted_iota(jnp.int32, (NHYP, K), 1)
            idxs = []
            cur = g
            for _ in range(8):
                am = jnp.argmax(cur, axis=1).astype(jnp.int32)
                idxs.append(am)
                cur = jnp.where(cols == am[:, None], -jnp.inf, cur)
            return jnp.sum(jnp.stack(idxs, axis=1))
        return jnp.sum(jax.vmap(one)(keys, mask))
    bench("s2 uniform + peel", peel_only, keys, mask)


if __name__ == "__main__":
    main()
    main2()
