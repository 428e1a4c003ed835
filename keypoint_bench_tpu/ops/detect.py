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


# NMS implementation selector. "pallas": the VMEM-resident fixpoint kernel
# (ops/pallas_nms.py) — 89 us/map at 512^2 on v5e when the batch amortizes
# the dispatch (vmap turns the kernel into a grid over maps), 4x faster
# than the XLA formulation (356 us/map bf16). "xla": the reduce_window
# formulation — the only choice off-TPU or for maps too big for VMEM.
# "auto" resolves to pallas on TPU for supported shapes, else xla.
# (Round-1 measured XLA ahead at batch 4; that was the ~3 ms dispatch floor
# masking the kernel cost, not a property of the kernel.)
_NMS_IMPL = ["auto"]
_AUTO_IMPL = "pallas"


def set_nms_impl(impl: str):
    assert impl in ("auto", "xla", "pallas")
    _NMS_IMPL[0] = impl
    # detection()/detection_batch() read the selector at trace time; drop
    # their cached traces so the switch applies to already-compiled shapes
    detection.clear_cache()
    detection_batch.clear_cache()


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

    3 reduce_window passes total: the full-width column max `colmax` is
    shared by the rows-before and rows-after parts (one (d,1) max over it
    serves both via shifted slices), and one (1,d) max over the padded map
    serves both same-row parts.
    """
    h, w = probs.shape
    neg = -jnp.inf
    padded = jnp.pad(probs, d, constant_values=0.0)
    # full-width [-d..d] column max per padded row
    colmax = lax.reduce_window(padded, neg, lax.max, (1, 2 * d + 1), (1, 1),
                               "VALID")                     # [h+2d, w]
    # d-row running max over colmax: row r of the output covers padded rows
    # r..r+d-1; slicing at 0 gives window rows [-d..-1], at d+1 rows [1..d]
    rowswin = lax.reduce_window(colmax, neg, lax.max, (d, 1), (1, 1),
                                "VALID")                    # [h+d+1, w]
    before_rows = lax.slice(rowswin, (0, 0), (h, w))
    after_rows = lax.slice(rowswin, (d + 1, 0), (d + 1 + h, w))
    # d-col running max per padded row: col c covers padded cols c..c+d-1
    colwin = lax.reduce_window(padded, neg, lax.max, (1, d), (1, 1),
                               "VALID")                     # [h+2d, w+d+1]
    before_cols = lax.slice(colwin, (d, 0), (d + h, w))
    after_cols = lax.slice(colwin, (d, d + 1), (d + h, d + 1 + w))
    m_before = jnp.maximum(before_rows, before_cols)
    m_after = jnp.maximum(after_rows, after_cols)
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


def _topk_stable_sort(flat: jnp.ndarray, k: int):
    """Top-k by full stable sort: deterministic (value desc, index asc)
    order on every backend. lax.top_k's tie order is backend-defined — on
    TPU it is NOT lowest-index-first, which matters a lot for bf16 score
    maps where sigmoid outputs collapse into few distinct values."""
    iota = lax.iota(jnp.int32, flat.shape[0])
    neg, idx = lax.sort((-flat, iota), num_keys=1, is_stable=True)
    return -neg[:k], idx[:k]


def _topk_candidates(flat: jnp.ndarray, k: int, chunk: int = 128,
                     per_chunk: int = 8):
    """Per-chunk max-extraction top-k candidates: returns (values [k],
    indices [k], unsafe scalar). `unsafe` is True iff the result might not
    be the exact (value desc, index asc) top-k — the caller must then fall
    back to _topk_stable_sort. See topk_select for the full story."""
    n = flat.shape[0]
    nc = n // chunk
    x = flat.reshape(nc, chunk)
    col = lax.broadcasted_iota(jnp.int32, (nc, chunk), 1)
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)[:, None]
    cand_v, cand_i = [], []
    cur = x
    for _ in range(per_chunk):
        am = jnp.argmax(cur, axis=1).astype(jnp.int32)       # lowest-index tie
        m = jnp.max(cur, axis=1)
        cand_v.append(m)
        cand_i.append(am)
        cur = jnp.where(col == am[:, None], -jnp.inf, cur)
    vals = jnp.stack(cand_v, axis=1)                          # [nc, pc]
    idxs = jnp.stack(cand_i, axis=1) + base                   # global indices
    pos0 = lax.iota(jnp.int32, nc * per_chunk)
    negv, pos = lax.sort((-vals.reshape(-1), pos0), num_keys=1,
                         is_stable=True)
    v2 = -negv[:k]
    i2 = idxs.reshape(-1)[pos[:k]]
    cutoff = v2[k - 1]
    # a block whose last (smallest) extracted value still >= cutoff may have
    # had further values >= cutoff (or cutoff ties with lower indices)
    unsafe = jnp.any(vals[:, per_chunk - 1] >= cutoff)
    return v2, i2, unsafe


def _topk_extractable(n: int, k: int, chunk: int = 128,
                      per_chunk: int = 8) -> bool:
    return n % chunk == 0 and k <= (n // chunk) * per_chunk and n > 4 * chunk


def topk_select(flat: jnp.ndarray, k: int, chunk: int = 128,
                per_chunk: int = 8):
    """Exact top-k via per-chunk max-extraction instead of a full sort,
    with DETERMINISTIC (value desc, index asc) tie order on all backends.

    XLA's lax.top_k sorts the whole array (~210 us for 262k values on v5e);
    the top-k of an NMS'd score map is highly spread out, so extracting the
    top `per_chunk` of every `chunk`-sized block (argmax + mask, per_chunk
    rounds — pure VPU passes) and stably merging the nc*per_chunk
    candidates is ~4x cheaper. EXACTNESS IS UNCONDITIONAL: if any block's
    last extracted value still reaches the merged cutoff (meaning the block
    could have held further top-k members or cutoff ties), the result falls
    back to a full stable sort via lax.cond.

    Tie-breaking: argmax picks the lowest index in a block, extraction
    order keeps equal values index-ordered, blocks enter the merge in index
    order, and the merge sort is stable — so equal values select lowest
    global indices first, matching lax.top_k on CPU (and the golden
    fixtures) but NOT lax.top_k on TPU, whose tie order is unspecified.

    NOTE: under vmap, lax.cond runs BOTH branches — batched callers should
    use detection_batch, which hoists a single any-map-unsafe predicate out
    of the vmap so the fallback sort only ever runs when needed.
    """
    if not _topk_extractable(flat.shape[0], k, chunk, per_chunk):
        return _topk_stable_sort(flat, k)
    v2, i2, unsafe = _topk_candidates(flat, k, chunk, per_chunk)
    return lax.cond(unsafe, lambda f: _topk_stable_sort(f, k),
                    lambda f: (v2, i2), flat)


def _local_max_mask_hwb(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """_local_max_mask for a [H, W, B] stack (batch on the minor/lane axis:
    both window axes are lane-free, so the reduce_windows cost no cross-lane
    permutes and every lane carries a different map)."""
    h, w, b = p.shape
    neg = -jnp.inf
    padded = jnp.pad(p, ((d, d), (d, d), (0, 0)), constant_values=0.0)
    colmax = lax.reduce_window(padded, neg, lax.max, (1, 2 * d + 1, 1),
                               (1, 1, 1), "VALID")
    rowswin = lax.reduce_window(colmax, neg, lax.max, (d, 1, 1), (1, 1, 1),
                                "VALID")
    before_rows = lax.slice(rowswin, (0, 0, 0), (h, w, b))
    after_rows = lax.slice(rowswin, (d + 1, 0, 0), (d + 1 + h, w, b))
    colwin = lax.reduce_window(padded, neg, lax.max, (1, d, 1), (1, 1, 1),
                               "VALID")
    before_cols = lax.slice(colwin, (d, 0, 0), (d + h, w, b))
    after_cols = lax.slice(colwin, (d, d + 1, 0), (d + h, d + 1 + w, b))
    m_before = jnp.maximum(before_rows, before_cols)
    m_after = jnp.maximum(after_rows, after_cols)
    return (p > m_before) & (p >= m_after)


def fast_nms_batched(probs: jnp.ndarray, nms_dist: int = 4, max_iter: int = 30,
                     min_value: float = 0.0) -> jnp.ndarray:
    """`fast_nms` over a [B, H, W] stack in one fixpoint loop.

    Identical per-map results to vmap(fast_nms) — per-map convergence is
    tracked and converged maps freeze (exactly like vmap's while_loop
    batching rule) — with the maps transposed to [H, W, B] so the batch
    occupies the minor (lane) axis and window reductions are lane-free.
    NOTE: measured SLOWER than the vmap layout at 512^2/batch 192 on v5e
    (the transposes + non-128-multiple lane padding eat the win); kept for
    parity coverage and for shapes where the layout pays off.
    """
    if nms_dist == 0:
        return probs
    d = nms_dist
    p = jnp.transpose(probs, (1, 2, 0))    # [H, W, B]
    h, w, b = p.shape

    def count_and_mask(p):
        mask = _local_max_mask_hwb(p, d)
        return mask, jnp.sum(mask.astype(jnp.int32), axis=(0, 1))

    def cond(state):
        _, _, count, prev_count, i = state
        return jnp.any(count != prev_count) & (i < max_iter)

    def body(state):
        p, mask, count, prev, i = state
        active = count != prev              # [B]
        maskf = mask.astype(p.dtype)
        padded = jnp.pad(maskf, ((d, d), (d, d), (0, 0)),
                         constant_values=0.0)
        s = lax.reduce_window(padded, 0.0, lax.add, (2 * d + 1, 1, 1),
                              (1, 1, 1), "VALID")
        s = lax.reduce_window(s, 0.0, lax.add, (1, 2 * d + 1, 1), (1, 1, 1),
                              "VALID")
        others = s - maskf
        supp = (others > 0.0) & active[None, None, :]
        p2 = jnp.where(supp, jnp.asarray(min_value, p.dtype), p)
        new_mask, new_count = count_and_mask(p2)
        # frozen (converged) maps keep their state verbatim
        p2 = jnp.where(active[None, None, :], p2, p)
        new_mask = jnp.where(active[None, None, :], new_mask, mask)
        new_count = jnp.where(active, new_count, count)
        new_prev = jnp.where(active, count, prev)
        return p2, new_mask, new_count, new_prev, i + 1

    mask0, count0 = count_and_mask(p)
    state = (p, mask0, count0, jnp.full((b,), -1, jnp.int32), jnp.int32(0))
    state = lax.while_loop(cond, body, state)
    return jnp.transpose(state[0], (2, 0, 1))


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
    nms = _nms_one(score_map, params)
    return _post_nms(nms, params)


def _nms_one(score_map: jnp.ndarray, params: DetectParams):
    """NMS on one (H, W) map with the selected implementation."""
    from keypoint_bench_tpu.ops import pallas_nms
    h, w = score_map.shape
    impl = _NMS_IMPL[0]
    if impl == "auto":
        impl = _AUTO_IMPL
    use_pallas = (impl == "pallas" and jax.default_backend() == "tpu"
                  and pallas_nms.supported(h, w))
    nms_fn = pallas_nms.fast_nms_pallas if use_pallas else fast_nms
    # no f32 cast on either path: the fixpoint is exact in the map's own
    # dtype (comparisons/maxes are order-preserving; the box sums count
    # <= (2d+1)^2 local maxima, and integers up to 256 are exact in bf16),
    # and bf16 maps halve the NMS HBM + VMEM traffic.
    return nms_fn(score_map, params.nms_dist, params.max_nms_iter)


def _kpts_from_topk(scores, idx, h: int, w: int, params: DetectParams):
    scores = scores.astype(jnp.float32)
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    x = (cols + 0.5) / w
    y = (rows + 0.5) / h
    kpts = jnp.stack([x, y, scores], axis=-1)
    valid = scores > params.threshold
    if params.min_score > 0:
        valid = valid & (scores > params.min_score)
    return kpts, valid


def _post_nms(nms: jnp.ndarray, params: DetectParams):
    """Border mask + top-k + (x, y, score) assembly on an NMS'd map."""
    h, w = nms.shape
    nms = remove_border(nms, params.border_dist)
    flat = nms.reshape(-1)
    k = min(params.top_k, flat.shape[0])
    scores, idx = topk_select(flat, k)
    return _kpts_from_topk(scores, idx, h, w, params)


def _detection_batch_fused(score_maps: jnp.ndarray, params: DetectParams,
                           per_chunk: int = 8, interpret: bool = False):
    """Fused-kernel batch detection: NMS fixpoint + border mask + per-chunk
    candidate peel all happen on the VMEM-resident map (one HBM read per
    map, ops/pallas_nms._nms_topk_kernel); the merge + exactness guard
    below is exactly topk_select with chunk = 128. Identical results to
    the unfused path (tests/test_pallas_nms.py)."""
    from keypoint_bench_tpu.ops import pallas_nms
    b, h, w = score_maps.shape
    k = min(params.top_k, h * w)
    nc = (w // 128) * per_chunk
    if k > h * nc:
        # not enough peeled candidates to cover k (small maps / large
        # top_k): the [:k] merge slices would clamp and the lax.cond
        # branches would disagree on shapes at trace time — mirror the
        # unfused path's _topk_extractable guard and fall back to it
        return detection_batch(score_maps, params)
    nms, v, i = jax.vmap(lambda s: pallas_nms.fast_nms_topk_pallas(
        s, params.nms_dist, params.max_nms_iter, params.border_dist,
        per_chunk, interpret=interpret))(score_maps)
    # candidate lane (blk, j); flat (row, blk, j) order is index-ordered
    vals = v.reshape(b, h * nc)
    gidx = (jnp.arange(h, dtype=jnp.int32)[None, :, None] * w
            + i).reshape(b, h * nc)

    def merge(fv, gi):
        pos0 = lax.iota(jnp.int32, fv.shape[0])
        negv, pos = lax.sort((-fv, pos0), num_keys=1, is_stable=True)
        return -negv[:k], gi[pos[:k]]

    vk, ik = jax.vmap(merge)(vals, gidx)
    # a chunk whose last (smallest) peeled value still reaches the merged
    # cutoff may have held further top-k members or lower-index ties —
    # fall back to the exact full sort (single batch-level predicate)
    cutoff = vk[:, k - 1]
    last = v[:, :, per_chunk - 1::per_chunk]        # [B, H, n_blk]
    unsafe = jnp.any(last >= cutoff[:, None, None])
    vk, ik = lax.cond(
        unsafe,
        lambda maps: jax.vmap(lambda m: _topk_stable_sort(
            remove_border(m.astype(jnp.float32),
                          params.border_dist).reshape(-1), k))(maps),
        lambda maps: (vk, ik), nms)
    return jax.vmap(
        lambda s_, i_: _kpts_from_topk(s_, i_, h, w, params))(vk, ik)


@functools.partial(jax.jit, static_argnames=("params",))
def detection_batch(score_maps: jnp.ndarray,
                    params: DetectParams = DetectParams()):
    """`detection` over a [B, H, W] (or [B, H, W, 1]) stack — the batched
    fast path for throughput pipelines (bench.py). Identical results to
    vmap(detection); the difference is that the rare exact-top-k fallback
    (see topk_select) is decided by ONE batch-level predicate outside the
    vmap, so the full stable sort never executes unless some map needs it
    (lax.cond under vmap runs both branches — ~2x detection cost)."""
    if score_maps.ndim == 4:
        score_maps = score_maps[..., 0]
    b, h, w = score_maps.shape
    k = min(params.top_k, h * w)
    # NOTE (measured, round 3): the fused-peel variant
    # (_detection_batch_fused) is NOT auto-selected — in-kernel candidate
    # extraction lost to the XLA extraction below (det stage 182 vs 121
    # us/map at 512^2 batch 96: 32 peel rounds of cross-lane max/argmax
    # reductions cost ~75 us/map, while the XLA extraction + merge it
    # replaces costs ~30). Kept tested for shapes where a future Mosaic
    # improves cross-lane reductions.
    nms = jax.vmap(lambda s: _nms_one(s, params))(score_maps)
    nmsb = jax.vmap(lambda m: remove_border(m, params.border_dist))(nms)
    flats = nmsb.reshape(b, h * w)
    if _topk_extractable(h * w, k):
        v, i, unsafe = jax.vmap(lambda f: _topk_candidates(f, k))(flats)
        v, i = lax.cond(
            jnp.any(unsafe),
            lambda fl: jax.vmap(lambda f: _topk_stable_sort(f, k))(fl),
            lambda fl: (v, i), flats)
    else:
        v, i = jax.vmap(lambda f: _topk_stable_sort(f, k))(flats)
    return jax.vmap(lambda s_, i_: _kpts_from_topk(s_, i_, h, w, params))(v, i)
