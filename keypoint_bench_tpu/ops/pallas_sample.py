"""Pallas TPU kernel: fused multi-branch sparse descriptor sampling.

The XLA mm sampler (ops/sparse_desc._apply_weight_mats) evaluates
``out[k, c] = sum_{y,x} Wr[k, y] Wc[k, x] feat[y, x, c]`` as two MXU
matmuls with a ``[K, W, C]`` intermediate that round-trips HBM (~32 MB/map
in bf16 at 512^2 across the branches) — measured ~150 us/map, ~2.5x the
MXU time of the contraction itself. This kernel keeps every branch feature
VMEM-resident and the intermediate in registers:

  * features arrive CHANNEL-MAJOR (NCHW per map: ``f[c, y, x]``) —
    indexing the leading ``c`` dim in VMEM is an address offset, not a
    lane/sublane relayout (the [H, W, 16] layout would waste 8x lanes on
    the 16-wide minor dim);
  * the interpolation-weight matrices are built IN-KERNEL from the raw
    keypoint pixel coordinates (px/py, one [KT] vector per tile): a
    handful of iota-compare VPU passes per branch replace the XLA-built
    one-hot matrices of the first kernel revision, which cost ~62 us/map
    to build and ~7 MB/map of HBM round-trip (tools/profile_r10.py);
  * per keypoint-tile (KT=128 lanes) and channel: one MXU dot
    ``t = f[c] @ WcT_tile`` ([h, w] x [w, KT]) and one VPU
    multiply-reduce with the row weights ``sum_y WrT[y, k] * t[y, k]``
    — keypoints stay on the LANE axis throughout, so nothing transposes;
  * all branches run in one kernel: one dispatch, one HBM read of the
    features (~10.6 MB/map), zero intermediates.

Buffering: the features CANNOT be ordinary pipelined blocks — Pallas
double-buffers every input block, and 2 x 10.6 MB busts the ~16 MB VMEM
scoped limit. They are passed in ANY (HBM) memory space instead and
DMA'd ONCE per map into single-buffered VMEM scratch at the map's first
keypoint tile; the tiny px/py coordinate tiles stay normal
(double-buffered) pipeline blocks. The grid is explicit (maps x
keypoint-tiles), so callers use the batched entry point rather than vmap.

The tap math mirrors ops/sparse_desc exactly: plain bilinear taps for the
full-res branch (_axis_taps_direct) and the composite
sample-of-aligned-upsample taps for low-res branches (_axis_taps_up), so
results match the mm/gather samplers (tests/test_pallas_sample.py).

Reference protocol being served: utils/extracter.py:193-221 +
utils/matcher.py:221-226 of /root/reference (descriptor sampling at
detected keypoints); parity vs the dense map is inherited from
ops/sparse_desc (tests/test_sparse_desc.py, tests/test_pallas_sample.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

KT = 128  # keypoints per grid step (one lane register width)

# resident feature budget: single-buffered VMEM scratch (~16 MB/core on
# v5e); the coordinate blocks + tap matrices + temporaries add ~1 MB on top
MAX_FEATURE_BYTES = 12 * 1024 * 1024


def _tap_matrix_direct(p: jnp.ndarray, n: int, n_pad: int,
                       row0=0) -> jnp.ndarray:
    """Transposed plain-bilinear tap matrix for one axis, built in-register:
    p [KT] continuous pixel coords -> [n_pad, KT] f32 with
    W[y - row0, k] = (y == y0_k) (1 - dy_k) + (y == y0_k + 1) dy_k
    (y0 = clip(floor(p), 0, n-2); dy from the unclipped floor — exactly
    ops/sparse_desc._axis_taps_direct). `row0` (scalar, may be traced)
    offsets the local window into the global axis — taps outside
    [row0, row0 + n_pad) simply never match and contribute zero."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, KT), 0) + row0
    y0f = jnp.floor(p)
    dy = p - y0f
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, n - 2)[None, :]
    return (jnp.where(rows == y0, (1.0 - dy)[None, :], 0.0)
            + jnp.where(rows == y0 + 1, dy[None, :], 0.0))


def _tap_matrix_up(p: jnp.ndarray, n_hi: int, n_lo: int, n_pad: int,
                   row0=0) -> jnp.ndarray:
    """Transposed composite upsample-tap matrix for one axis: the sample of
    the align-corners-upsampled axis at p equals a 4-term combination of
    low-res entries la, la+1, lb, lb+1 (ops/sparse_desc._axis_taps_up
    math, identical including clips). p [KT] -> [n_pad, KT] f32; `row0`
    as in _tap_matrix_direct."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, KT), 0) + row0
    y0f = jnp.floor(p)
    dy = p - y0f
    y0 = y0f.astype(jnp.int32)
    s = (n_lo - 1.0) / (n_hi - 1.0)

    def lo_frac(y):
        src = y.astype(jnp.float32) * s
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_lo - 2)
        return lo, src - lo.astype(jnp.float32)

    la, fa = lo_frac(y0)
    lb, fb = lo_frac(jnp.minimum(y0 + 1, n_hi - 1))
    terms = ((la, (1.0 - dy) * (1.0 - fa)), (la + 1, (1.0 - dy) * fa),
             (lb, dy * (1.0 - fb)), (lb + 1, dy * fb))
    out = None
    for pos, wgt in terms:
        term = jnp.where(rows == pos[None, :], wgt[None, :], 0.0)
        out = term if out is None else out + term
    return out


def _kernel(*refs, n_branches: int, sizes):
    from jax.experimental.pallas import tpu as pltpu

    n = n_branches
    f_hbm = refs[:n]
    px_ref, py_ref = refs[n], refs[n + 1]
    out_ref = refs[n + 2]
    f_vm = refs[n + 3:n + 3 + n]
    sem = refs[n + 3 + n]

    b = pl.program_id(0)
    k = pl.program_id(1)

    def dma(i):
        return pltpu.make_async_copy(f_hbm[i].at[b], f_vm[i], sem.at[i])

    @pl.when(k == 0)
    def _load_features():
        for i in range(n):
            dma(i).start()
        for i in range(n):
            dma(i).wait()

    pxv = px_ref[0, 0]
    pyv = py_ref[0, 0]
    h0, w0 = sizes[0]
    row = 0
    for i in range(n):
        h_pad, w_pad = f_vm[i].shape[1], f_vm[i].shape[2]
        if i == 0:
            wrv = _tap_matrix_direct(pyv, h0, h_pad)           # [h_pad, KT]
            wcv = _tap_matrix_direct(pxv, w0, w_pad)           # [w_pad, KT]
        else:
            h_lo, w_lo = sizes[i]
            wrv = _tap_matrix_up(pyv, h0, h_lo, h_pad)
            wcv = _tap_matrix_up(pxv, w0, w_lo, w_pad)
        wcv = wcv.astype(f_vm[i].dtype)
        ch = f_vm[i].shape[0]
        # channel grouping: one MXU dot per G channels ([G*h, w] x [w, KT]
        # — the [G, h, w] -> [G*h, w] collapse is layout-free) instead of
        # per-channel dots, and G-row aligned output writes instead of
        # single-row (sub-sublane-tile) stores. G bounds the f32
        # intermediate to ~1 MB of VMEM.
        g = max(1, min(ch, (1024 * 1024) // (h_pad * KT * 4)))
        while ch % g:
            g -= 1
        for c0 in range(0, ch, g):
            blk = f_vm[i][c0:c0 + g].reshape(g * h_pad, w_pad)
            # t[(c, y), k] = sum_x f[c, y, x] WcT[x, k]  (MXU)
            t = jnp.dot(blk, wcv, preferred_element_type=jnp.float32)
            # out[row + c, k] = sum_y WrT[y, k] t[(c, y), k]  (VPU, lanes=k)
            vals = jnp.sum(t.reshape(g, h_pad, KT) * wrv[None], axis=1)
            out_ref[0, row:row + g, :] = vals
            row += g


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "lo_shapes", "interpret"))
def fused_samples_batch(feats_b, px_b, py_b, h: int, w: int, lo_shapes,
                        interpret: bool = False):
    """feats_b: tuple of [B, C_i, h_pad_i, w_pad_i] channel-major (NCHW)
    features, zero-padded to Mosaic alignment (sublanes 16 / lanes 128 —
    sparse_desc._pad_feat_cm); px_b/py_b: [B, Kp] f32 continuous pixel
    coordinates (Kp a multiple of KT; pad with zeros). h/w: the full-res
    map size (branch-0 tap domain + upsample target); lo_shapes: tuple of
    TRUE (h_lo, w_lo) per low-res branch (pre-padding). Returns
    [B, sum_i C_i, Kp] f32 branch-stacked samples."""
    from jax.experimental.pallas import tpu as pltpu

    n = len(feats_b)
    assert len(lo_shapes) == n - 1
    bsz, kp = px_b.shape
    assert kp % KT == 0, kp
    total_c = sum(int(f.shape[1]) for f in feats_b)
    sizes = ((h, w),) + tuple(tuple(s) for s in lo_shapes)

    # coordinates ride as [B, 1, Kp] so the (1, 1, KT) block satisfies the
    # Mosaic constraint on the last two dims (1 == full dim, KT % 128 == 0)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY) for _ in feats_b]
                + [pl.BlockSpec((1, 1, KT), lambda b, k: (b, 0, k))] * 2)
    scratch = [pltpu.VMEM(tuple(f.shape[1:]), f.dtype) for f in feats_b]
    scratch.append(pltpu.SemaphoreType.DMA((n,)))
    return pl.pallas_call(
        functools.partial(_kernel, n_branches=n, sizes=sizes),
        grid=(bsz, kp // KT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, total_c, KT), lambda b, k: (b, 0, k)),
        out_shape=jax.ShapeDtypeStruct((bsz, total_c, kp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*feats_b, px_b.astype(jnp.float32)[:, None],
      py_b.astype(jnp.float32)[:, None])


def fused_samples(feats_t, px, py, h: int, w: int, lo_shapes,
                  interpret: bool = False):
    """Single-map convenience wrapper: feats_t [C_i, h_pad_i, w_pad_i],
    px/py [Kp] -> [sum C_i, Kp] f32. NOT vmappable (the kernel manages its
    own map grid + DMA) — batch via fused_samples_batch."""
    out = fused_samples_batch(tuple(f[None] for f in feats_t),
                              px[None], py[None], h, w, lo_shapes,
                              interpret=interpret)
    return out[0]


def supported(feats_t) -> bool:
    """Kernel applicability for per-map feats [C, h, w]: every branch
    spatially >= 4 (the composite upsample taps span 4 rows) and the
    resident features fit the VMEM scratch budget."""
    total = 0
    for f in feats_t:
        c, h, w = f.shape[-3], f.shape[-2], f.shape[-1]
        if h < 4 or w < 4:
            return False
        total += c * w * h * f.dtype.itemsize
    return total <= MAX_FEATURE_BYTES


# ---------------------------------------------------------------------------
# Sorted-tile (band-restricted) kernel: keypoints arrive SORTED by their
# full-res row tap base y0, so each KT-tile only touches a narrow row band
# of every branch. The one-hot row contraction then runs over ROWS0 resident
# rows instead of the full height — a ~4x FLOP cut at 512^2 (the full kernel
# spends 2/3 of its MXU time on branch 0's [h, w] x [w, KT] dots). Each
# grid step DMAs just its band (dynamic-start async copy), so VMEM holds
# ~2.7 MB instead of the whole 10.6 MB feature set.
#
# Correctness contract (enforced by the caller, ops/sparse_desc): for every
# keypoint in tile t, y0 must lie in [starts[t], starts[t] + ROWS0 - 2];
# the caller checks the sorted spans and falls back to the full kernel via
# lax.cond when any tile overflows (clustered keypoints). Low-res branch
# windows derive from starts[t] in-kernel; their static sizes bound the
# composite-tap span (see _band_sizes) so coverage is guaranteed.

# full-res rows resident per keypoint tile; KBT_SAMPLE_ROWS0 overrides for
# perf sweeps (must keep (h - rows0) % 8 == 0 for the sorted dispatch —
# sorted_supported enforces it). Default 80: measured best on the bench
# sweep (512^2 B=96: 128 -> 2570.9 fps, 112 -> 2588.3, 96 -> 2607.7,
# 80 -> 2644.2, 64 -> compile blowup/DNF). Smaller bands = less DMA and
# less one-hot MXU per tile; the batch-level exact fallback covers tiles
# whose sorted span overflows the band.
ROWS0 = int(os.environ.get("KBT_SAMPLE_ROWS0", "80"))


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _band_sizes(h: int, lo_shapes, rows0: int):
    """Static per-branch resident row counts: branch 0 keeps rows0 rows;
    low-res branch i covers every composite tap of a rows0-row full-res
    window: la >= floor(start*s) and lb+1 <= floor((start + rows0 - 1)*s)
    + 1 <= start*s + (rows0-1)*s + 2 -> ceil(rows0*s) + 3 rows suffice,
    plus 8 slack because the in-kernel low-res start is aligned DOWN to
    the Mosaic sublane tiling (dynamic DMA offsets must be 8-divisible)."""
    import math
    sizes = [rows0]
    for h_lo, _ in lo_shapes:
        s = (h_lo - 1.0) / (h - 1.0)
        sizes.append(min(_pad8(math.ceil(rows0 * s) + 3 + 8),
                         _pad_up16(h_lo)))
    return tuple(sizes)


def _pad_up16(n: int) -> int:
    return -(-n // 16) * 16


def _sorted_kernel(*refs, n_branches: int, sizes, band_sizes, n_tiles: int):
    from jax.experimental.pallas import tpu as pltpu

    n = n_branches
    f_hbm = refs[:n]
    starts_ref = refs[n]
    px_ref, py_ref = refs[n + 1], refs[n + 2]
    out_ref = refs[n + 3]
    f_vm = refs[n + 4:n + 4 + n]
    sem = refs[n + 4 + n]

    b = pl.program_id(0)
    t = pl.program_id(1)
    h0, w0 = sizes[0]
    # branches whose band spans all rows stay resident across the map
    # (one DMA at tile 0); banded branches double-buffer — tile t+1's band
    # is in flight while tile t computes
    whole = [band_sizes[i] == f_hbm[i].shape[2] for i in range(n)]

    def row0s_for(tt):
        """Per-branch 8-aligned band starts for tile tt. starts arrive in
        units of 8 rows: Mosaic must PROVE dynamic DMA offsets on the
        sublane dim divisible by the (8, 128) tiling, and a value loaded
        from SMEM is opaque to its prover — a syntactic `q * 8` is not."""
        start0 = starts_ref[b, tt] * 8              # pre-clamped by caller
        outs = [start0]
        for i in range(1, n):
            h_lo = sizes[i][0]
            s = (h_lo - 1.0) / (h0 - 1.0)
            st = jnp.floor(start0.astype(jnp.float32) * s).astype(jnp.int32)
            hp_i = f_hbm[i].shape[2]
            q = jnp.clip(st // 8, 0, (hp_i - band_sizes[i]) // 8)
            outs.append(q * 8)                      # 8-aligned, provably so
        return outs

    def dma(i, tt, row0, slot):
        if whole[i]:
            return pltpu.make_async_copy(f_hbm[i].at[b], f_vm[i],
                                         sem.at[0, i])
        return pltpu.make_async_copy(
            f_hbm[i].at[b, :, pl.ds(row0, band_sizes[i]), :],
            f_vm[i].at[slot], sem.at[slot, i])

    slot = lax.rem(t, 2)
    row0s = row0s_for(t)

    @pl.when(t == 0)
    def _first():
        for i in range(n):
            dma(i, t, row0s[i], slot).start()

    @pl.when(t == 0)
    def _wait_whole():
        for i in range(n):
            if whole[i]:
                dma(i, t, row0s[i], slot).wait()

    for i in range(n):
        if not whole[i]:
            dma(i, t, row0s[i], slot).wait()

    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        nxt = row0s_for(t + 1)
        for i in range(n):
            if not whole[i]:
                dma(i, t + 1, nxt[i], lax.rem(t + 1, 2)).start()

    pxv = px_ref[0, 0]
    pyv = py_ref[0, 0]
    row = 0
    for i in range(n):
        sz, w_pad = band_sizes[i], f_vm[i].shape[-1]
        fv = f_vm[i] if whole[i] else f_vm[i][slot]
        if i == 0:
            wrv = _tap_matrix_direct(pyv, h0, sz, row0s[0])    # [sz, KT]
            wcv = _tap_matrix_direct(pxv, w0, w_pad)           # [w_pad, KT]
        else:
            h_lo, w_lo = sizes[i]
            wrv = _tap_matrix_up(pyv, h0, h_lo, sz, row0s[i])
            wcv = _tap_matrix_up(pxv, w0, w_lo, w_pad)
        wcv = wcv.astype(fv.dtype)
        ch = fv.shape[0]
        g = max(1, min(ch, (1024 * 1024) // (sz * KT * 4)))
        while ch % g:
            g -= 1
        for c0 in range(0, ch, g):
            blk = fv[c0:c0 + g].reshape(g * sz, w_pad)
            t2 = jnp.dot(blk, wcv, preferred_element_type=jnp.float32)
            vals = jnp.sum(t2.reshape(g, sz, KT) * wrv[None], axis=1)
            out_ref[0, row:row + g, :] = vals
            row += g


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "lo_shapes", "rows0",
                                    "interpret"))
def fused_samples_sorted_batch(feats_b, px_b, py_b, starts_b, h: int, w: int,
                               lo_shapes, rows0: int = ROWS0,
                               interpret: bool = False):
    """Sorted-tile variant of fused_samples_batch. px_b/py_b [B, Kp] must
    be sorted by y0 = clip(floor(py), 0, h-2) per map; starts_b [B, T]
    (T = Kp // KT) gives each tile's first resident full-res row, already
    clamped to [0, h - rows0]. The caller must guarantee every tile's y0
    span fits [starts[t], starts[t] + rows0 - 2]. Returns
    [B, sum C_i, Kp] f32 branch-stacked samples (in the SORTED keypoint
    order)."""
    from jax.experimental.pallas import tpu as pltpu

    n = len(feats_b)
    assert len(lo_shapes) == n - 1
    bsz, kp = px_b.shape
    assert kp % KT == 0, kp
    total_c = sum(int(f.shape[1]) for f in feats_b)
    sizes = ((h, w),) + tuple(tuple(s) for s in lo_shapes)
    band_sizes = _band_sizes(h, lo_shapes, rows0)

    in_specs = ([pl.BlockSpec(memory_space=pl.ANY) for _ in feats_b]
                + [pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec((1, 1, KT), lambda b, k: (b, 0, k))] * 2)
    # banded branches double-buffer (slot dim 2); whole-resident branches
    # (band == full padded height) keep one buffer for the whole map
    scratch = []
    for i, f in enumerate(feats_b):
        c_i, hp_i, wp_i = int(f.shape[1]), int(f.shape[2]), int(f.shape[3])
        if band_sizes[i] == hp_i:
            scratch.append(pltpu.VMEM((c_i, hp_i, wp_i), f.dtype))
        else:
            scratch.append(pltpu.VMEM((2, c_i, band_sizes[i], wp_i),
                                      f.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, n)))
    # starts ride as 8-row units so the kernel's `q * 8` is provably
    # tile-aligned (see _sorted_kernel)
    return pl.pallas_call(
        functools.partial(_sorted_kernel, n_branches=n, sizes=sizes,
                          band_sizes=band_sizes, n_tiles=kp // KT),
        grid=(bsz, kp // KT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, total_c, KT), lambda b, k: (b, 0, k)),
        out_shape=jax.ShapeDtypeStruct((bsz, total_c, kp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*feats_b, (starts_b.astype(jnp.int32) // 8),
      px_b.astype(jnp.float32)[:, None], py_b.astype(jnp.float32)[:, None])


def sorted_supported(feats_t, h: int, rows0: int = ROWS0) -> bool:
    """Sorted-tile kernel applicability: the standard `supported` checks
    plus a map tall enough that banding means anything, and (h - rows0)
    8-aligned — otherwise the 8-aligned start clamp caps the resident span
    at (h-rows0)//8*8 + rows0 - 2 < h - 2, so keypoints in the bottom
    (h - rows0) % 8 rows would fail the coverage check on EVERY batch and
    the dispatch would silently run the full kernel forever (ADVICE r3);
    requiring alignment makes that degradation explicit here instead."""
    return supported(feats_t) and h >= rows0 and (h - rows0) % 8 == 0
