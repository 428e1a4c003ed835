"""Pallas TPU kernel: the full iterative-NMS fixpoint, VMEM-resident.

Semantics are identical to `ops.detect.fast_nms` (which mirrors the reference
utils/extracter.py:6-100): each round computes the window-argmax local-max
mask (row-major tie-breaking, zero padding), suppresses every pixel that has
another local max inside its (2d+1)^2 window, and repeats until the local-max
count is stable (static `max_iter` cap).

Why a kernel: the XLA formulation performs ~10 full-map HBM passes per round
(reduce_window maxes + box sums + selects), and smooth CNN score maps run the
fixpoint for many rounds — NMS was ~25% of the benchmark step. A 512x512 f32
map is 1 MB, so the *entire* fixpoint fits in VMEM: one HBM read, ~30 rounds
of pure VPU work on-chip, one HBM write. Shifted-window maxes/sums replace
reduce_window (static pad+slice only — Pallas TPU has no dynamic slicing on
refs, CLAUDE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

# Whole-map kernel: the map plus ~8 live temporaries must fit in VMEM
# (~16 MB/core on v5e). 2 MB of f32 map (e.g. 704x704, or KITTI 352x1216)
# leaves headroom; beyond that, detection() falls back to the XLA path.
MAX_PIXELS = 512 * 1024


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[i, j] = x[i - dy, j - dx], zeros shifted in (the reference's
    zero-padding window semantics)."""
    h, w = x.shape
    x = jnp.pad(x, ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))))
    return lax.slice(x, (max(-dy, 0), max(-dx, 0)), (max(-dy, 0) + h, max(-dx, 0) + w))


def _dir_max(x: jnp.ndarray, d: int, dy: int, dx: int) -> jnp.ndarray:
    """Max over x shifted by k*(dy, dx) for k = 1..d (log-doubling)."""
    acc = _shift(x, dy, dx)
    covered = 1
    while covered < d:
        step = min(covered, d - covered)
        acc = jnp.maximum(acc, _shift(acc, dy * step, dx * step))
        covered += step
    return acc


def _window_sum(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Sum over offsets [-d..d] along `axis` (zero padding), via doubling of
    disjoint partial sums: S_{a+b}[i] = S_a[i] + S_b[i - a]."""
    def sh(a, k):
        return _shift(a, *((0, k) if axis == 1 else (k, 0)))

    # pad by d so the recentered lookup S[i + 2d] stays in bounds at the
    # right edge (backward sums composed on the unpadded array lose the tail)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (d, d)
    xp = jnp.pad(x, pad)
    # binary-width partial sums: pow2[k][i] = sum of xp[i - 2^k + 1 .. i]
    target = 2 * d + 1
    pow2 = [xp]
    while (1 << len(pow2)) <= target:
        w = 1 << (len(pow2) - 1)
        pow2.append(pow2[-1] + sh(pow2[-1], w))
    # compose S_target from binary widths (disjoint shifted spans)
    acc, covered = None, 0
    for k in reversed(range(len(pow2))):
        if covered + (1 << k) <= target:
            part = sh(pow2[k], covered) if covered else pow2[k]
            acc = part if acc is None else acc + part
            covered += 1 << k
    # S_target[ip] = sum xp[ip-2d .. ip]; padded ip = i + d, so the centered
    # window sum of x at i is S_target[i + 2d]
    return lax.slice_in_dim(acc, 2 * d, 2 * d + x.shape[axis], axis=axis)


def _local_max_mask(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """Row-major first-argmax tie-breaking: strictly greater than every window
    value before the center, >= every value after (see detect._local_max_mask)."""
    left = _dir_max(p, d, 0, 1)    # max of p[i, j-k]
    right = _dir_max(p, d, 0, -1)  # max of p[i, j+k]
    row_full = jnp.maximum(jnp.maximum(left, right), p)
    above = _dir_max(row_full, d, 1, 0)   # rows i-d..i-1, all cols
    below = _dir_max(row_full, d, -1, 0)  # rows i+1..i+d, all cols
    m_before = jnp.maximum(above, left)
    m_after = jnp.maximum(below, right)
    return (p > m_before) & (p >= m_after)


def _nms_kernel(p_ref, out_ref, *, d: int, max_iter: int, min_value: float):
    p0 = p_ref[...].astype(jnp.float32)

    def count_and_mask(p):
        mask = _local_max_mask(p, d)
        return mask, jnp.sum(mask.astype(jnp.int32))

    def cond(state):
        _, _, count, prev, i = state
        return (count != prev) & (i < max_iter)

    def body(state):
        p, mask, count, _, i = state
        maskf = mask.astype(jnp.float32)
        others = _window_sum(_window_sum(maskf, d, 0), d, 1) - maskf
        p = jnp.where(others > 0.0, jnp.float32(min_value), p)
        new_mask, new_count = count_and_mask(p)
        return p, new_mask, new_count, count, i + 1

    mask0, count0 = count_and_mask(p0)
    state = (p0, mask0, count0, jnp.int32(-1), jnp.int32(0))
    out_ref[...] = lax.while_loop(cond, body, state)[0]


@functools.partial(jax.jit, static_argnames=("nms_dist", "max_iter",
                                             "min_value", "interpret"))
def fast_nms_pallas(probs: jnp.ndarray, nms_dist: int = 4, max_iter: int = 30,
                    min_value: float = 0.0, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for detect.fast_nms on (H, W) maps small enough for VMEM."""
    if nms_dist == 0:
        return probs
    kernel = functools.partial(_nms_kernel, d=nms_dist, max_iter=max_iter,
                               min_value=min_value)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(probs.shape, jnp.float32),
        interpret=interpret,
    )(probs)
    return out.astype(probs.dtype)


def supported(h: int, w: int) -> bool:
    return h * w <= MAX_PIXELS
