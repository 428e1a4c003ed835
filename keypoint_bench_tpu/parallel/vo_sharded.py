"""Sequence-sharded VO: the frame axis partitioned over the 'data' mesh axis
with a ppermute halo exchange of boundary frames (SURVEY.md §5.7: "sequence-
axis sharding of VO keyframe windows over hosts with halo exchange of
boundary frames").

Each shard holds a contiguous window of frames' detections; the pair
(i-1, i) at a window boundary needs the previous shard's last frame, which
arrives via one `ppermute` hop. All pair-pose solves then run locally and
concurrently; only the final GT-scale compose chain (tasks/vo.py:chain_poses)
is sequential, on host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from keypoint_bench_tpu.ops.matching import brute_force_match
from keypoint_bench_tpu.tasks.vo import vo_pair_pose

_AXIS = "data"


def sharded_vo_pair_solves(mesh, kpts, valids, descs, keys, fx, cx, cy,
                           w, h, max_distance: float = 5.0,
                           n_hyp: int = 1024):
    """kpts [T,K,3], valids [T,K], descs [T,K,D], keys [T] — all sharded on T.
    Returns (R [T,3,3], t [T,3], ok [T]): the relative pose of pair
    (max(0, i-1), i) for every frame i. T must be divisible by the 'data'
    axis size."""
    scale_px = jnp.asarray([w - 1.0, h - 1.0])

    def shard_fn(k, v, d, ks):
        n_shards = jax.lax.psum(1, _AXIS)
        idx = jax.lax.axis_index(_AXIS)
        # halo: previous shard's last frame (ring permute; shard 0 fixes up
        # below by pairing its first frame with itself)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        halo_k = jax.lax.ppermute(k[-1], _AXIS, perm)
        halo_v = jax.lax.ppermute(v[-1], _AXIS, perm)
        halo_d = jax.lax.ppermute(d[-1], _AXIS, perm)
        first = idx == 0
        halo_k = jnp.where(first, k[0], halo_k)
        halo_v = jnp.where(first, v[0], halo_v)
        halo_d = jnp.where(first, d[0], halo_d)

        prev_k = jnp.concatenate([halo_k[None], k[:-1]])
        prev_v = jnp.concatenate([halo_v[None], v[:-1]])
        prev_d = jnp.concatenate([halo_d[None], d[:-1]])

        def solve(k0, v0, d0, k1, v1, d1, key):
            m0, m1, ok = brute_force_match(k0, v0, k1, v1, d0, d1,
                                           max_distance)
            R, t, n_in, okp = vo_pair_pose(
                m0[:, 0:2] * scale_px, m1[:, 0:2] * scale_px, ok,
                jnp.asarray(fx), jnp.asarray(cx), jnp.asarray(cy), key,
                n_hyp=n_hyp)
            return R, t, okp

        return jax.vmap(solve)(prev_k, prev_v, prev_d, k, v, d, ks)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS)),
                   out_specs=(P(_AXIS), P(_AXIS), P(_AXIS)))
    return jax.jit(fn)(kpts, valids, descs, keys)
