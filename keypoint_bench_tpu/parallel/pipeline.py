"""Device-staged pipeline parallelism (PP) for the extract pipeline.

The reference has no distributed story at all (SURVEY.md §2.7); PARITY.md
argues that for keypoint evaluation DP strictly dominates PP because every
image/pair is independent. This module makes that argument *executable*
instead of rhetorical: a real two-stage GPipe-style pipeline — stage 0
devices run the model forward, stage 1 devices run detection — with
microbatch activations flowing stage0 -> stage1 over `lax.ppermute`, so the
PP-vs-DP comparison can be measured (tests/test_pipeline_pp.py runs both on
the same virtual mesh; PARITY.md §2.7 records the numbers).

SPMD shape: one `shard_map` over a ('stage',) mesh axis. Every device runs
the same scanned program; `lax.axis_index('stage')` selects the stage role
per tick via `lax.cond` (real control flow under shard_map — each device
executes only its own stage's branch at runtime). A pipeline with M
microbatches takes M + 1 ticks; the bubble fraction is 1/(M+1) with perfectly
balanced stages and worse otherwise — exactly the overhead DP does not pay
for embarrassingly parallel eval, which is why the runner's sharded paths
use DP (parallel/evaluate.py) and this stays a demonstrator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_stage_mesh(devices=None) -> Mesh:
    """Two pipeline stages over the given devices (first 2)."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= 2, "pipeline parallelism needs >= 2 devices"
    return Mesh(np.array(devices[:2]), ("stage",))


def _zeros_like_tree(t):
    return jax.tree.map(jnp.zeros_like, t)


def two_stage_pipeline(mesh: Mesh, stage0, stage1, xs):
    """Run `stage1(stage0(x))` for every microbatch x in `xs` on a 2-stage
    device pipeline.

    xs: pytree of [M, ...] arrays — M microbatches (replicated on entry; a
        production input pipeline would feed stage-0 hosts only).
    stage0: x_mb -> act pytree (the model forward, runs on stage-0 devices).
    stage1: act -> out pytree (detection/post, runs on stage-1 devices).
    Returns the stacked outputs, pytree of [M, ...], bit-identical to
    `jax.lax.map(lambda x: stage1(stage0(x)), xs)`.
    """
    M = jax.tree.leaves(xs)[0].shape[0]
    x0 = jax.tree.map(lambda a: a[0], xs)
    act_shape = jax.eval_shape(stage0, x0)
    out_shape = jax.eval_shape(stage1, jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), act_shape))

    def device_fn(xs_local):
        sid = lax.axis_index("stage")
        act0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), act_shape)
        outs0 = jax.tree.map(
            lambda s: jnp.zeros((M,) + s.shape, s.dtype), out_shape)

        def tick(carry, i):
            buf, outs = carry
            # stage 0 works on microbatch i (last tick i == M is drain-only)
            x_i = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(
                    a, jnp.minimum(i, M - 1), 0, keepdims=False), xs_local)
            act = lax.cond(sid == 0, lambda: stage0(x_i),
                           lambda: act0)
            # stage 1 works on the activation received last tick (mb i-1)
            out = lax.cond((sid == 1) & (i >= 1), lambda: stage1(buf),
                           lambda: jax.tree.map(
                               lambda s: jnp.zeros(s.shape, s.dtype),
                               out_shape))
            write = (sid == 1) & (i >= 1)
            j = jnp.maximum(i - 1, 0)
            outs = jax.tree.map(
                lambda o, v: jnp.where(
                    write, lax.dynamic_update_index_in_dim(o, v, j, 0), o),
                outs, out)
            # activations flow 0 -> 1 (stage 1's send is dropped)
            buf = jax.tree.map(
                lambda a: lax.ppermute(a, "stage", [(0, 1)]), act)
            return (buf, outs), None

        (_, outs), _ = lax.scan(tick, (act0, outs0), jnp.arange(M + 1))
        # results live on stage-1 devices; stage 0 holds zeros -> psum
        # replicates (bool via i32)
        def rep(o):
            if o.dtype == jnp.bool_:
                return lax.psum(o.astype(jnp.int32), "stage") > 0
            return lax.psum(o, "stage")
        return jax.tree.map(rep, outs)

    fn = shard_map(device_fn, mesh=mesh, in_specs=(P(),), out_specs=P(),
                   check_vma=False)
    return jax.jit(fn)(xs)


def pipeline_extract(mesh: Mesh, model_fn, params, dp, imgs,
                     n_micro: int):
    """The concrete extract pipeline: stage 0 = model forward (weights live
    with stage 0), stage 1 = fixed-K detection. imgs [B, H, W, C] with B
    divisible by n_micro -> (kpts [B, K, 3], valid [B, K])."""
    from keypoint_bench_tpu.ops.detect import detection_batch

    b = imgs.shape[0]
    mb = b // n_micro
    xs = imgs.reshape((n_micro, mb) + imgs.shape[1:])

    def stage0(x):
        score, _ = model_fn(params, x)
        return score[..., 0] if score.ndim == 4 else score

    def stage1(score):
        return detection_batch(score, dp)

    kpts, valid = two_stage_pipeline(mesh, stage0, stage1, xs)
    return (kpts.reshape((b,) + kpts.shape[2:]),
            valid.reshape((b,) + valid.shape[2:]))
