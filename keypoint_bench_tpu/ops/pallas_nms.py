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
of pure VPU work on-chip, one HBM write.

Mosaic notes: shifted windows use jnp.roll + broadcasted-iota edge masking
(tpu.rotate) — jnp.pad lowers to misaligned tpu.concatenate which Mosaic
rejects ("result/input offset mismatch on non-concat dimension"). The
suppression test "another local max within the window" is a max over the
window minus its center, which reuses the same strict-before/after window
decomposition as the argmax mask (no box sums needed).
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
    zero-padding window semantics). roll + edge mask, no pad/concat.
    Dtype-generic: the fill is a zero of x's dtype (i16 keys use 0 too —
    the sortable transform maps 0.0 to key 0)."""
    h, w = x.shape
    zero = jnp.asarray(0, x.dtype)
    r = x
    if dy:
        r = jnp.roll(r, dy, axis=0)
        ri = lax.broadcasted_iota(jnp.int32, (h, w), 0)
        r = jnp.where(ri >= dy if dy > 0 else ri < h + dy, r, zero)
    if dx:
        r = jnp.roll(r, dx, axis=1)
        ci = lax.broadcasted_iota(jnp.int32, (h, w), 1)
        r = jnp.where(ci >= dx if dx > 0 else ci < w + dx, r, zero)
    return r


def _dir_max(x: jnp.ndarray, d: int, dy: int, dx: int) -> jnp.ndarray:
    """Max over x shifted by k*(dy, dx) for k = 1..d (log-doubling; zero-fill
    shifts match the zero-padding window semantics exactly)."""
    acc = _shift(x, dy, dx)
    covered = 1
    while covered < d:
        step = min(covered, d - covered)
        acc = jnp.maximum(acc, _shift(acc, dy * step, dx * step))
        covered += step
    return acc


def _window_parts(p: jnp.ndarray, d: int):
    """(m_before, m_after): window maxes over the row-major offsets strictly
    before / strictly after the center (zero padding). Their union is the
    whole (2d+1)^2 window minus the center."""
    left = _dir_max(p, d, 0, 1)    # p[i, j-k], k = 1..d
    right = _dir_max(p, d, 0, -1)  # p[i, j+k]
    row_full = jnp.maximum(jnp.maximum(left, right), p)
    above = _dir_max(row_full, d, 1, 0)   # rows i-d..i-1, all cols
    below = _dir_max(row_full, d, -1, 0)  # rows i+1..i+d, all cols
    return jnp.maximum(above, left), jnp.maximum(below, right)


def _local_max_mask(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """Row-major first-argmax tie-breaking: strictly greater than every window
    value before the center, >= every value after (see detect._local_max_mask)."""
    m_before, m_after = _window_parts(p, d)
    return (p > m_before) & (p >= m_after)


def _nms_kernel(p_ref, out_ref, mask_ref, cnt_ref, *, d: int, max_iter: int,
                min_value):
    """Fixpoint loop with all loop state in scratch refs: Mosaic cannot
    legalize lax.while_loop carrying whole-map vectors (scf.yield of ~500
    8x128 vector chunks), but a fori_loop whose body only mutates VMEM/SMEM
    scratch lowers cleanly. cnt_ref holds [count, prev_count]. Dtype-
    generic: runs on f32 maps or on int16 sortable keys (masks are 0/1 in
    the map dtype either way)."""
    dt = out_ref.dtype

    def count_and_mask(p):
        mask = _local_max_mask(p, d)
        return mask, jnp.sum(mask.astype(jnp.int32))

    out_ref[...] = p_ref[...]
    mask0, count0 = count_and_mask(out_ref[...])
    mask_ref[...] = mask0.astype(dt)
    cnt_ref[0] = count0
    cnt_ref[1] = jnp.int32(-1)

    def body(_, carry):
        @pl.when(cnt_ref[0] != cnt_ref[1])
        def _round():
            p = out_ref[...]
            # suppressed iff some OTHER local max lies in the window: max of
            # the mask over the window minus its center (masks are exact
            # 0/1 values, so "> 0" is the membership test in any dtype)
            b, a = _window_parts(mask_ref[...], d)
            others = jnp.maximum(b, a) > jnp.asarray(0, dt)
            p = jnp.where(others, jnp.asarray(min_value, dt), p)
            new_mask, new_count = count_and_mask(p)
            out_ref[...] = p
            mask_ref[...] = new_mask.astype(dt)
            cnt_ref[1] = cnt_ref[0]
            cnt_ref[0] = new_count
        return carry

    lax.fori_loop(0, max_iter, body, 0)


def _peel_kernel(p_ref, v_ref, i_ref, *, border: int, per_chunk: int):
    """Border mask + per-chunk top-candidate extraction on an NMS'd map:
    the map is border-zeroed (detect.remove_border semantics) and each
    128-lane chunk's top `per_chunk` values are peeled off by repeated
    (max, lowest-index argmax, mask) rounds — pure VPU passes on VMEM,
    replacing the full-map argmax rounds of detect._topk_candidates
    (~8 HBM passes in XLA). A separate kernel from the fixpoint: fusing
    both busts the ~16 MB scoped VMEM limit (measured 17.47M), and the
    extra map round-trip costs only ~2.5 us. Candidates come out as
    [H, 128] panes (lane blk*per_chunk + j = round-j candidate of column
    block blk): value desc per chunk, lowest index first on ties —
    exactly the chunk contract of detect.topk_select with chunk = 128."""
    h, w = p_ref.shape
    # The chunk structure matches detect._topk_candidates exactly, so the
    # unsafe fallback stays as rare as the XLA path's (row-sized chunks
    # measured tie-unsafe on bf16 sigmoid maps: the 262k fallback sort
    # fired every batch and cost ~350 us/map). All intermediates keep 2D
    # [H, 1] shape (keepdims) — 1D [H] values would live on lanes and
    # every [:, None] broadcast would be a lane->sublane relayout.
    pane = lax.broadcasted_iota(jnp.int32, (h, 128), 1)
    ri = lax.broadcasted_iota(jnp.int32, (h, 128), 0)
    vacc = jnp.zeros((h, 128), jnp.float32)
    iacc = jnp.zeros((h, 128), jnp.int32)
    for blk in range(w // 128):
        li = pane + blk * 128
        curb = p_ref[:, blk * 128:(blk + 1) * 128]
        if border > 0:
            keep = ((ri >= border) & (ri < h - border)
                    & (li >= border) & (li < w - border))
            curb = jnp.where(keep, curb, 0.0)
        for j in range(per_chunk):
            m = jnp.max(curb, axis=1, keepdims=True)           # [H, 1]
            idx = jnp.min(jnp.where(curb == m, li, w), axis=1,
                          keepdims=True)                       # lowest index
            lane = blk * per_chunk + j
            vacc = jnp.where(pane == lane, m, vacc)
            iacc = jnp.where(pane == lane, idx, iacc)
            curb = jnp.where(li == idx, -jnp.inf, curb)
    v_ref[...] = vacc
    i_ref[...] = iacc


@functools.partial(jax.jit, static_argnames=("nms_dist", "max_iter",
                                             "border_dist", "per_chunk",
                                             "min_value", "interpret"))
def fast_nms_topk_pallas(probs: jnp.ndarray, nms_dist: int = 4,
                         max_iter: int = 30, border_dist: int = 8,
                         per_chunk: int = 8, min_value: float = 0.0,
                         interpret: bool = False):
    """Fused fast_nms + remove_border + per-chunk candidate extraction
    (chunk = 128 consecutive columns of a row; requires w % 128 == 0 and
    (w // 128) * per_chunk <= 128).

    Returns (nms_map [H, W] in probs' dtype — WITHOUT the border applied,
    matching fast_nms_pallas so fallbacks recompute from it; vals
    [H, n_blk*per_chunk] f32; idx [H, n_blk*per_chunk] i32 GLOBAL column
    indices). Candidates are the border-masked map's per-chunk top values,
    value-descending with lowest-index-first ties; flat candidate order
    (row, blk, j) is index-ordered, matching detect._topk_candidates.
    detect.detection_batch merges them into the exact global top-k with
    the standard chunk-cutoff safety test."""
    if nms_dist == 0:
        raise ValueError("fused topk requires nms_dist > 0")
    dt = probs.dtype
    h, w = probs.shape
    n_blk = w // 128
    # shape preconditions raise (not assert — asserts vanish under -O and
    # would let the peel kernel mis-index)
    if w % 128 != 0 or n_blk * per_chunk > 128:
        raise ValueError(
            f"fused topk requires w % 128 == 0 and (w // 128) * per_chunk "
            f"<= 128; got h={h}, w={w}, per_chunk={per_chunk}")
    # f32 VMEM fixpoint (v5e Mosaic has no 16-bit vector compares — see
    # fast_nms_pallas); value-exact for bf16 inputs
    nms = fast_nms_pallas(probs.astype(jnp.float32), nms_dist, max_iter,
                          min_value, interpret=interpret)
    peel = functools.partial(_peel_kernel, border=border_dist,
                             per_chunk=per_chunk)
    v, i = pl.pallas_call(
        peel,
        out_shape=(jax.ShapeDtypeStruct((h, 128), jnp.float32),
                   jax.ShapeDtypeStruct((h, 128), jnp.int32)),
        interpret=interpret,
    )(nms)
    nc = n_blk * per_chunk
    return nms.astype(dt), v[:, :nc], i[:, :nc]


@functools.partial(jax.jit, static_argnames=("nms_dist", "max_iter",
                                             "min_value", "interpret"))
def fast_nms_pallas(probs: jnp.ndarray, nms_dist: int = 4, max_iter: int = 30,
                    min_value: float = 0.0, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for detect.fast_nms on (H, W) maps small enough for VMEM."""
    if nms_dist == 0:
        return probs
    from jax.experimental.pallas import tpu as pltpu
    dt = probs.dtype
    # The kernel runs in f32 VMEM and converts at the edges. This is forced
    # by the target, not taste: v5e Mosaic rejects BOTH bf16 vector
    # comparisons ("Target does not support this comparison", arith.cmpf)
    # AND int16 vector compares/maxes (same error on arith.cmpi i16,
    # failed-to-legalize on arith.maxsi) — so a 16-bit fixpoint (bf16
    # directly, or bf16 bits as sortable int16 keys) cannot lower at all.
    # Measured negative result, round 3; don't revisit on v5e. The f32
    # round-trip is value-exact (bf16 -> f32 is an embedding, and
    # suppression only writes min_value), so results equal the bf16 XLA
    # fast_nms bit for bit.
    kernel = functools.partial(_nms_kernel, d=nms_dist, max_iter=max_iter,
                               min_value=min_value)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(probs.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(probs.shape, jnp.float32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(probs.astype(jnp.float32))
    return out.astype(dt)


def supported(h: int, w: int) -> bool:
    return h * w <= MAX_PIXELS
