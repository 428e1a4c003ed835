"""Keypoint detection pipeline: iterative-fixpoint NMS -> border mask -> static top-K.

Semantics parity targets (reference, studied not copied):
  * utils/extracter.py:6-100   `fast_nms` — repeat {argmax(window)==center mask;
    suppress window neighbours of each local max} until the local-max count
    stops changing. Zero padding, row-major first-max tie-breaking.
  * utils/extracter.py:129-161 `prob_map_to_positions_with_prob` — positions are
    (col+0.5)/W, (row+0.5)/H with score, raster order.
  * utils/extracter.py:164-190 `remove_border_points` — zero a border band.
  * utils/extracter.py:193-221 `detection` — NMS, border, threshold, sort by
    score, top-k, min-score filter.

TPU design: the reference's data-dependent `while True` becomes a
`lax.while_loop` with a convergence test on the local-max count and a static
iteration cap; the variable-N `nonzero` output becomes a fixed-K
`jax.lax.top_k` with a validity mask. The unfold/fold suppression is replaced
by `lax.reduce_window` box sums/maxes (identical math, no [ks*ks,H,W]
materialization).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax


# NMS implementation selector. "xla" (default): the reduce_window
# formulation — under vmap it vectorizes across maps, which on real batched
# workloads beats the Pallas kernel's sequential per-map grid (measured on
# v5e: pair_step 378.6 vs 359.3 frames/s at batch 4). "pallas": the
# VMEM-resident fixpoint kernel (ops/pallas_nms.py) — ~4x faster per single
# map (0.4 vs 1.6 ms), the right choice for latency-critical single-image
# paths. "auto" currently resolves to xla.
_NMS_IMPL = ["auto"]
_AUTO_IMPL = "xla"


def set_nms_impl(impl: str):
    assert impl in ("auto", "xla", "pallas")
    _NMS_IMPL[0] = impl
    # detection() reads the selector at trace time; drop its cached traces
    # so the switch applies to already-compiled shapes too
    detection.clear_cache()


@dataclasses.dataclass(frozen=True)
class DetectParams:
    """Extractor parameters (reference config/config.yaml:17-22 `extractor_params`)."""

    nms_dist: int = 4
    threshold: float = 0.0
    border_dist: int = 8
    top_k: int = 300
    min_score: float = 0.0
    max_nms_iter: int = 30  # static cap for the NMS fixpoint loop


def _window_max(padded: jnp.ndarray, h: int, w: int, d: int,
                r0: int, r1: int, c0: int, c1: int) -> jnp.ndarray:
    """Max over relative offsets rows [r0..r1] x cols [c0..c1] of a (H+2d, W+2d)
    zero-padded map; returns (H, W). Separable (rows then cols): a (a x b)
    rectangular max costs a+b VPU compares per pixel instead of a*b."""
    wr = r1 - r0 + 1
    wc = c1 - c0 + 1
    m = padded
    if wr > 1:
        m = lax.reduce_window(m, -jnp.inf, lax.max, (wr, 1), (1, 1), "VALID")
    if wc > 1:
        m = lax.reduce_window(m, -jnp.inf, lax.max, (1, wc), (1, 1), "VALID")
    return lax.dynamic_slice(m, (d + r0, d + c0), (h, w))


def _box_sum(padded: jnp.ndarray, h: int, w: int, d: int) -> jnp.ndarray:
    ks = 2 * d + 1
    s = lax.reduce_window(padded, 0.0, lax.add, (ks, 1), (1, 1), "VALID")
    s = lax.reduce_window(s, 0.0, lax.add, (1, ks), (1, 1), "VALID")
    return s  # (H, W): padded is (H+2d, W+2d), separable ks x ks box sum


def _local_max_mask(probs: jnp.ndarray, d: int) -> jnp.ndarray:
    """Center-of-window argmax mask with the reference's exact tie-breaking.

    A pixel p is a local max iff its value is strictly greater than every
    window value at a row-major position *before* the center and >= every
    value after (zero padding contributes value 0, as F.unfold does).
    """
    h, w = probs.shape
    padded = jnp.pad(probs, d, constant_values=0.0)
    # offsets before center (row-major): rows [-d..-1] all cols; row 0 cols [-d..-1]
    m_before = jnp.maximum(
        _window_max(padded, h, w, d, -d, -1, -d, d),
        _window_max(padded, h, w, d, 0, 0, -d, -1),
    )
    # offsets after center: row 0 cols [1..d]; rows [1..d] all cols
    m_after = jnp.maximum(
        _window_max(padded, h, w, d, 0, 0, 1, d),
        _window_max(padded, h, w, d, 1, d, -d, d),
    )
    return (probs > m_before) & (probs >= m_after)


def fast_nms(probs: jnp.ndarray, nms_dist: int = 4, max_iter: int = 30,
             min_value: float = 0.0) -> jnp.ndarray:
    """Iterative local-max NMS over a (H, W) score map.

    Matches reference utils/extracter.py:6-100: each round finds window-argmax
    local maxima, then zeroes every pixel that has some *other* local max
    within its (2*nms_dist+1)^2 window; rounds repeat until the local-max
    count is stable (static cap `max_iter` for TPU compilation).
    """
    if nms_dist == 0:
        return probs
    d = nms_dist
    h, w = probs.shape

    def count_and_mask(p):
        mask = _local_max_mask(p, d)
        return mask, jnp.sum(mask.astype(jnp.int32))

    def cond(state):
        _, _, count, prev_count, i = state
        return (count != prev_count) & (i < max_iter)

    def body(state):
        # the carried mask is the local-max mask of the carried map, so each
        # iteration computes _local_max_mask exactly once (the reference
        # recomputes it for its recount; the values are identical)
        p, mask, count, _, i = state
        maskf = mask.astype(probs.dtype)
        padded = jnp.pad(maskf, d, constant_values=0.0)
        # box-sum minus self: #local maxima in window excluding p itself
        others = _box_sum(padded, h, w, d) - maskf
        p = jnp.where(others > 0.0, jnp.asarray(min_value, probs.dtype), p)
        new_mask, new_count = count_and_mask(p)
        return p, new_mask, new_count, count, i + 1

    mask0, count0 = count_and_mask(probs)
    # after the first suppression round the loop re-counts; emulate the
    # reference's do-while by seeding prev_count with an impossible value
    state = (probs, mask0, count0, jnp.int32(-1), jnp.int32(0))
    # run one suppression round unconditionally (reference always suppresses
    # at least once before it can observe a stable count)
    state = lax.while_loop(cond, body, state)
    return state[0]


def remove_border(probs: jnp.ndarray, border_dist: int) -> jnp.ndarray:
    """Zero a `border_dist`-wide band (reference utils/extracter.py:164-190)."""
    if border_dist <= 0:
        return probs
    h, w = probs.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    keep = ((row >= border_dist) & (row < h - border_dist)
            & (col >= border_dist) & (col < w - border_dist))
    return jnp.where(keep, probs, 0.0)


@functools.partial(jax.jit, static_argnames=("params",))
def detection(score_map: jnp.ndarray, params: DetectParams = DetectParams()):
    """Score map (H, W) or (H, W, 1) -> fixed-K keypoints.

    Returns:
      kpts: [K, 3] of (x, y, score); x=(col+0.5)/W, y=(row+0.5)/H
            (reference utils/extracter.py:129-161 coordinate convention),
            sorted by descending score.
      valid: [K] bool — score > threshold (and > min_score when set).
    """
    if score_map.ndim == 3:
        score_map = score_map[..., 0]
    h, w = score_map.shape
    from keypoint_bench_tpu.ops import pallas_nms
    impl = _NMS_IMPL[0]
    if impl == "auto":
        impl = _AUTO_IMPL
    use_pallas = (impl == "pallas" and jax.default_backend() == "tpu"
                  and pallas_nms.supported(h, w))
    nms_fn = pallas_nms.fast_nms_pallas if use_pallas else fast_nms
    nms = nms_fn(score_map.astype(jnp.float32), params.nms_dist,
                 params.max_nms_iter)
    nms = remove_border(nms, params.border_dist)

    flat = nms.reshape(-1)
    k = min(params.top_k, flat.shape[0])
    scores, idx = lax.top_k(flat, k)
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    x = (cols + 0.5) / w
    y = (rows + 0.5) / h
    kpts = jnp.stack([x, y, scores], axis=-1)
    valid = scores > params.threshold
    if params.min_score > 0:
        valid = valid & (scores > params.min_score)
    return kpts, valid


def detection_batch(score_maps: jnp.ndarray, params: DetectParams = DetectParams()):
    """vmap of `detection` over a leading batch axis."""
    return jax.vmap(lambda s: detection(s, params))(score_maps)
