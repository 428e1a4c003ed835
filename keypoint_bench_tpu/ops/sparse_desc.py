"""Sparse (keypoint-only) descriptor evaluation for pyramid-head models.

The reference protocol (utils/extracter.py:193-221 + utils/matcher.py:206-234)
materializes a dense full-resolution descriptor map — d1 + up2(d2) + up8(d3)
+ up32(d4) @ 512^2 x 64 — and then bilinearly samples it at the K<=1000
detected keypoints. On TPU that dense map is the single largest HBM cost of
the whole pipeline (~32 MB bf16 written + re-read per image, PERF.md).

This module computes the SAME sampled descriptors without the dense map:
bilinear sampling, align-corners upsampling and the 1x1 head are all linear,
so they commute —

    sample(p, head(concat_i up_i(a_i))) == sum_i head_i(sample_up(p, a_i))

`sample_up` (sampling an align-corners-upsampled map at a continuous
full-res pixel coordinate) is evaluated EXACTLY by expanding the two
interpolations: the sample interpolates the 4 integer-grid corners of the
upsampled map, and each corner is itself a 2-tap interpolation of the
low-res map (models/common.py:_interp_matrix semantics: src = y*(h_lo-1)/
(h_hi-1), lo = clip(floor(src), 0, h_lo-2)). The composite footprint spans
<= 3 consecutive low-res rows/cols, fetched as one [K, 4, 4, C] patch
gather with weights combined per axis.

Exactness: identical to sample_at_points(dense_map, kpts) up to float
summation order (verified by tests/test_sparse_desc.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


# Sampling implementation: "gather" = per-point 4x4 patch gathers (exact,
# latency-bound on TPU); "mm" = one-hot interpolation-weight matrices x two
# MXU matmuls (throughput-bound; exact in f32, weight-rounding ~2^-8 in bf16).
# "auto": mm for bf16 features (bench fast path), gather for f32 (parity).
_SAMPLE_IMPL = ["auto"]


def set_sample_impl(impl: str):
    assert impl in ("auto", "gather", "mm")
    _SAMPLE_IMPL[0] = impl


def _use_mm(dtype) -> bool:
    impl = _SAMPLE_IMPL[0]
    if impl == "auto":
        return dtype == jnp.bfloat16
    return impl == "mm"


def _onehot4(idx, dtype):
    return (idx[:, None] == jnp.arange(4)[None, :]).astype(dtype)


def _axis_taps_up(p: jnp.ndarray, n_hi: int, n_lo: int):
    """Composite interpolation taps along one axis.

    p [K]: continuous full-res pixel coordinate in [0, n_hi-1).
    Returns (base [K] int32, w [K, 4]) such that the sample of the
    align-corners-upsampled axis at p equals sum_j w[:, j] * low[base + j].
    """
    y0f = jnp.floor(p)
    dy = (p - y0f).astype(jnp.float32)
    y0 = y0f.astype(jnp.int32)
    s = (n_lo - 1.0) / (n_hi - 1.0)

    def lo_frac(y):
        src = y.astype(jnp.float32) * s
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_lo - 2)
        return lo, src - lo

    la, fa = lo_frac(y0)
    lb, fb = lo_frac(jnp.minimum(y0 + 1, n_hi - 1))
    base = jnp.clip(la, 0, n_lo - 4)
    oa = la - base
    ob = lb - base
    w = ((1.0 - dy)[:, None]
         * ((1.0 - fa)[:, None] * _onehot4(oa, jnp.float32)
            + fa[:, None] * _onehot4(oa + 1, jnp.float32))
         + dy[:, None]
         * ((1.0 - fb)[:, None] * _onehot4(ob, jnp.float32)
            + fb[:, None] * _onehot4(ob + 1, jnp.float32)))
    return base, w


def _axis_taps_direct(p: jnp.ndarray, n: int):
    """Plain bilinear taps along one axis (full-res feature): base + [K,2]."""
    y0f = jnp.floor(p)
    dy = (p - y0f).astype(jnp.float32)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, n - 2)
    w = jnp.stack([1.0 - dy, dy], axis=-1)
    return y0, w


def _patch_gather(feat: jnp.ndarray, rbase: jnp.ndarray, cbase: jnp.ndarray,
                  size: int) -> jnp.ndarray:
    """feat [h, w, C]; per-point [size, size, C] patches -> [K, s, s, C]."""
    c = feat.shape[-1]
    return jax.vmap(
        lambda r, cb: lax.dynamic_slice(feat, (r, cb, 0), (size, size, c))
    )(rbase, cbase)


def _axis_weight_matrix(base: jnp.ndarray, w: jnp.ndarray, n: int, dtype):
    """Scatter per-point tap weights into a dense [K, n] interpolation-weight
    matrix (rows sum to 1): W[k, base[k] + j] = w[k, j]."""
    taps = w.shape[1]
    cols = base[:, None] + jnp.arange(taps)[None, :]          # [K, taps]
    hit = (cols[:, :, None] == jnp.arange(n)[None, None, :])
    return jnp.sum(jnp.where(hit, w[:, :, None], 0.0), axis=1).astype(dtype)


def _apply_weight_mats(feat, rbase, wr, cbase, wc):
    """Row/col interpolation-weight matrices applied as two MXU matmuls
    (throughput path — no gathers). feat [h, w, C] -> [K, C].

    The [K, w, C] intermediate is emitted directly in the feature dtype
    (the MXU accumulates in f32 either way, so preferred_element_type=bf16
    equals the old f32-output-then-astype form bit-for-bit). Measured
    neutral on the bench — XLA already fused the cast into the matmul
    epilogue — kept for the simpler graph. The intermediate's HBM
    round-trip itself is what the Pallas fused sampler
    (ops/pallas_sample.py) removes."""
    h, w = feat.shape[0], feat.shape[1]
    dt = feat.dtype
    Wr = _axis_weight_matrix(rbase, wr, h, dt)                # [K, h]
    Wc = _axis_weight_matrix(cbase, wc, w, dt)                # [K, w]
    t = jnp.einsum("kh,hwc->kwc", Wr, feat, preferred_element_type=dt)
    return jnp.einsum("kw,kwc->kc", Wc, t,
                      preferred_element_type=jnp.float32)


def sample_direct(feat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Bilinear sample of a full-res feature map at pixel coords -> [K, C].
    Matches ops/grid_sample.sample_bilinear_pixels for in-bounds points."""
    rbase, wr = _axis_taps_direct(py, feat.shape[0])
    cbase, wc = _axis_taps_direct(px, feat.shape[1])
    if _use_mm(feat.dtype):
        return _apply_weight_mats(feat, rbase, wr, cbase, wc)
    patch = _patch_gather(feat, rbase, cbase, 2).astype(jnp.float32)
    return jnp.einsum("ka,kb,kabc->kc", wr, wc, patch)


def _un_s2d_hw(fb: jnp.ndarray, bsz: int, ch: int) -> jnp.ndarray:
    """Unbatched inverse space-to-depth: [h, w, b*b*ch] -> [h*b, w*b, ch]."""
    h, w = fb.shape[0], fb.shape[1]
    x = fb.reshape(h, w, bsz, bsz, ch).transpose(0, 2, 1, 3, 4)
    return x.reshape(h * bsz, w * bsz, ch)


def sample_direct_blk(fb: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                      bsz: int, ch: int):
    """`sample_direct` on a space-to-depth block-layout feature
    [h/b, w/b, b*b*ch] (channel order (r, s, c) as models/alike_s2d.s2d):
    the [K, h] row-interp matrix reshapes exactly to [K, h/b, b]
    (row y = b*Y + r), so the row contraction becomes b matmuls against the
    per-r channel groups; the flattened result has column index x = b*X + s,
    so the column contraction is unchanged. Identical math to
    sample_direct(un_s2d(fb)) up to float summation order.

    MEASURED SLOWER than un_s2d + sample_direct in the bench pipeline
    (1999 -> 1005 fps): the per-r 64-lane channel slices are <128-lane
    relayouts (CLAUDE.md pathology) — un_s2d is the matmul-optimal relayout
    and its ~60 us/map is cheaper. Kept as a tested utility for layouts
    where the block channel count is lane-aligned."""
    hb, wb = fb.shape[0], fb.shape[1]
    h, w = hb * bsz, wb * bsz
    rbase, wr = _axis_taps_direct(py, h)
    cbase, wc = _axis_taps_direct(px, w)
    dt = fb.dtype
    if not _use_mm(dt):
        return sample_direct(_un_s2d_hw(fb, bsz, ch), px, py)
    Wr = _axis_weight_matrix(rbase, wr, h, dt)                # [K, h]
    Wc = _axis_weight_matrix(cbase, wc, w, dt)                # [K, w]
    Wrb = Wr.reshape(Wr.shape[0], hb, bsz)                    # y = b*Y + r
    grp = bsz * ch
    t = sum(
        jnp.dot(Wrb[:, :, r], fb[:, :, r * grp:(r + 1) * grp].reshape(hb, -1),
                preferred_element_type=jnp.float32)
        for r in range(bsz))                                  # [K, wb*b*ch]
    t = t.reshape(-1, w, ch)                                  # x = b*X + s
    return jnp.einsum("kw,kwc->kc", Wc, t.astype(dt),
                      preferred_element_type=jnp.float32)


def sample_upsampled(feat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                     h_hi: int, w_hi: int):
    """Sample `upsample_align_corners(feat, -> (h_hi, w_hi))` at continuous
    full-res pixel coords (px, py) WITHOUT materializing the upsampled map.
    feat [h_lo, w_lo, C] with h_lo, w_lo >= 4 -> [K, C] (f32)."""
    h_lo, w_lo = feat.shape[0], feat.shape[1]
    if h_lo < 4 or w_lo < 4:
        # tiny maps (e.g. 64^2 test images): dense fallback, same math
        from keypoint_bench_tpu.models.common import resize_bilinear_align
        from keypoint_bench_tpu.ops.grid_sample import sample_bilinear_pixels
        up = resize_bilinear_align(feat[None].astype(jnp.float32),
                                   h_hi, w_hi)[0]
        return sample_bilinear_pixels(up, px, py)
    rbase, wr = _axis_taps_up(py, h_hi, h_lo)
    cbase, wc = _axis_taps_up(px, w_hi, w_lo)
    if _use_mm(feat.dtype):
        return _apply_weight_mats(feat, rbase, wr, cbase, wc)
    patch = _patch_gather(feat, rbase, cbase, 4).astype(jnp.float32)
    return jnp.einsum("ka,kb,kabc->kc", wr, wc, patch)


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_feat_cm(f: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad a channel-major feature [..., C, h, w] to Mosaic DMA
    alignment: lanes (w) to 128, sublanes (h) to 16. The matching tap
    matrices carry zero rows there, so results are unchanged."""
    h_i, w_i = f.shape[-2], f.shape[-1]
    hp, wp = _pad_up(h_i, 16), _pad_up(w_i, 128)
    if wp == w_i and hp == h_i:
        return f
    cfg = [(0, 0)] * (f.ndim - 2) + [(0, hp - h_i), (0, wp - w_i)]
    return jnp.pad(f, cfg)


def _apply_head(params: dict, o: jnp.ndarray) -> jnp.ndarray:
    """Branch-stacked samples [..., 64, Kp] -> descriptors [..., Kp, 64]
    via the aggregation head's descriptor columns."""
    wh = params["convhead2.weight"][0, 0].astype(jnp.float32)  # [64, 65]
    desc = jnp.einsum("...qk,qd->...kd", o, wh[:, :-1])
    bh = params.get("convhead2.bias")
    if bh is not None:
        desc = desc + bh[:-1].astype(jnp.float32)
    return desc


def alike_sparse_descriptors_cm(params: dict, feats_t, kpts: jnp.ndarray,
                                h: int, w: int,
                                interpret: bool = False) -> jnp.ndarray:
    """`alike_sparse_descriptors` on CHANNEL-MAJOR branch features
    (a_it [C, H_i, W_i], from models/alike_s2d.alike_s2d_feats_cm), fused
    into one Pallas kernel (ops/pallas_sample.py): the features stay
    VMEM-resident, the interpolation taps are built in-kernel from the
    raw coordinates, and no [K, W, C] intermediate touches HBM.

    kpts [K, >=2] normalized (x, y); returns [K, 64] f32, equal to the mm
    sampler / dense sampling up to float summation order. Falls back to
    the XLA path (via transposes) when the kernel doesn't apply (tiny
    branch maps or VMEM overflow). NOT vmappable (the kernel manages its
    own grid) — use alike_sparse_descriptors_cm_batch for batches.
    """
    from keypoint_bench_tpu.ops import pallas_sample

    if not pallas_sample.supported(feats_t):
        feats = [jnp.transpose(f, (1, 2, 0)) for f in feats_t]
        return alike_sparse_descriptors(params, feats, kpts, h, w)

    px = kpts[:, 0] * (w - 1.0)
    py = kpts[:, 1] * (h - 1.0)
    k = px.shape[0]
    kp = -(-k // pallas_sample.KT) * pallas_sample.KT
    px = jnp.pad(px, (0, kp - k))
    py = jnp.pad(py, (0, kp - k))
    lo_shapes = tuple((int(f.shape[1]), int(f.shape[2]))
                      for f in feats_t[1:])
    padded = tuple(_pad_feat_cm(f) for f in feats_t)
    o = pallas_sample.fused_samples(padded, px, py, h, w, lo_shapes,
                                    interpret=interpret)      # [64, Kp]
    return _apply_head(params, o)[:k]


def alike_sparse_descriptors_cm_batch(params: dict, feats_b,
                                      kpts_b: jnp.ndarray, h: int, w: int,
                                      interpret: bool = False) -> jnp.ndarray:
    """Batched `alike_sparse_descriptors_cm`: feats_b tuple of
    [B, C, H_i, W_i], kpts_b [B, K, >=2] -> [B, K, 64] f32. The kernel
    grid covers (maps x keypoint tiles) directly — do NOT vmap this."""
    from keypoint_bench_tpu.ops import pallas_sample

    if not pallas_sample.supported([f[0] for f in feats_b]):
        feats = [jnp.transpose(f, (0, 2, 3, 1)) for f in feats_b]
        return jax.vmap(
            lambda f1, f2, f3, f4, kk: alike_sparse_descriptors(
                params, (f1, f2, f3, f4), kk, h, w))(*feats, kpts_b)

    k = kpts_b.shape[1]
    kp = -(-k // pallas_sample.KT) * pallas_sample.KT
    px = jnp.pad(kpts_b[:, :, 0] * (w - 1.0), ((0, 0), (0, kp - k)))
    py = jnp.pad(kpts_b[:, :, 1] * (h - 1.0), ((0, 0), (0, kp - k)))
    lo_shapes = tuple((int(f.shape[2]), int(f.shape[3]))
                      for f in feats_b[1:])
    padded = tuple(_pad_feat_cm(f) for f in feats_b)
    if (_CM_SORTED[0] and
            pallas_sample.sorted_supported([f[0] for f in feats_b], h)):
        desc = _cm_sorted_dispatch(params, padded, px, py, k, h, w,
                                   lo_shapes, interpret)
    else:
        o = pallas_sample.fused_samples_batch(padded, px, py, h, w,
                                              lo_shapes, interpret=interpret)
        desc = _apply_head(params, o)
    return desc[:, :k]


# sorted-tile kernel toggle (profiling A/B; the sorted path is the default
# wherever the kernel applies — tests cover both)
_CM_SORTED = [True]


def set_cm_sorted(on: bool):
    _CM_SORTED[0] = bool(on)


def _cm_sorted_dispatch(params: dict, padded, px: jnp.ndarray,
                        py: jnp.ndarray, k: int, h: int, w: int, lo_shapes,
                        interpret: bool = False) -> jnp.ndarray:
    """Band-restricted sampling: sort each map's keypoints by their row-tap
    base y0, so every KT-tile touches only a ~ROWS0-row band of the
    features (ops/pallas_sample._sorted_kernel — a ~4x MXU cut vs the
    full-height one-hot contraction). A single batch-level lax.cond falls
    back to the full kernel when any tile's span overflows (clustered
    keypoints). The sort permutation is undone with an exact one-hot row
    select (matching.take_rows), so results are identical to the full
    kernel in the original keypoint order."""
    from keypoint_bench_tpu.ops import pallas_sample
    from keypoint_bench_tpu.ops.matching import take_rows

    kt, rows0 = pallas_sample.KT, pallas_sample.ROWS0
    bsz, kp = px.shape
    t = kp // kt
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    # pad slots (>= k, zero coords) key to h so they sort LAST — same key
    # as the yorder variant; keying them y0=0 put pads in tile 0, forcing
    # start=0 and spurious batch-level fallbacks whenever real low-tile
    # keypoints sat below row rows0-2 (ADVICE r3). Their band mismatch in
    # the sorted kernel yields zero samples, dropped by the caller's [:k].
    iota = jnp.broadcast_to(jnp.arange(kp, dtype=jnp.int32), (bsz, kp))
    key = jnp.where(iota < k, y0, h)
    keys_s, pxs, pys, order = jax.vmap(
        lambda a, b, c, d: lax.sort((a, b, c, d), num_keys=1,
                                    is_stable=True))(key, px, py, iota)
    tiles = keys_s.reshape(bsz, t, kt)
    # starts 8-aligned: Mosaic requires dynamic DMA offsets on the sublane
    # dim to be divisible by the (8, 128) tiling
    starts = jnp.minimum((tiles[:, :, 0] // 8) * 8, (h - rows0) // 8 * 8)
    # coverage: every y0 in [start, start + rows0 - 2] (clamped tiles pass
    # automatically when h - rows0 is 8-aligned: bound >= h - 2 >= any y0);
    # pad slots (key h) are excluded from the span check
    ok = jnp.all((tiles <= (starts + rows0 - 2)[:, :, None]) | (tiles >= h))
    # pos_of[orig] = position of original keypoint `orig` in sorted order
    pos_of = jax.vmap(lambda o: lax.sort(
        (o, lax.iota(jnp.int32, kp)), num_keys=1, is_stable=True)[1])(order)

    def _sorted_branch(_):
        o = pallas_sample.fused_samples_sorted_batch(
            padded, pxs, pys, starts, h, w, lo_shapes, rows0=rows0,
            interpret=interpret)
        return jax.vmap(take_rows)(_apply_head(params, o), pos_of)

    def _full_branch(_):
        o = pallas_sample.fused_samples_batch(padded, px, py, h, w,
                                              lo_shapes, interpret=interpret)
        return _apply_head(params, o)

    return lax.cond(ok, _sorted_branch, _full_branch, None)


def alike_sparse_descriptors_cm_batch_yorder(params: dict, feats_b,
                                             kpts_b: jnp.ndarray,
                                             valid_b: jnp.ndarray,
                                             h: int, w: int,
                                             interpret: bool = False):
    """Throughput variant of `alike_sparse_descriptors_cm_batch` that
    returns (desc [B, K, 64], kpts [B, K, 3], valid [B, K]) with all three
    row-permuted into the sampler's y-sorted order (consistent across the
    outputs) — skipping the exact unsort matmul (matching.take_rows,
    ~25 us/map at K=1000). Mutual-NN matching downstream is permutation-
    equivariant, so match counts and matched coordinate pairs are
    identical to the original-order API (tests/test_pallas_sample.py).
    Falls back to the original-order API (returning inputs unpermuted)
    when the sorted kernel doesn't apply."""
    from keypoint_bench_tpu.ops import pallas_sample

    if not (_CM_SORTED[0]
            and pallas_sample.sorted_supported([f[0] for f in feats_b], h)):
        desc = alike_sparse_descriptors_cm_batch(params, feats_b, kpts_b,
                                                 h, w, interpret=interpret)
        return desc, kpts_b, valid_b

    kt, rows0 = pallas_sample.KT, pallas_sample.ROWS0
    bsz, k = kpts_b.shape[0], kpts_b.shape[1]
    kp = -(-k // kt) * kt
    pad = ((0, 0), (0, kp - k))
    px = jnp.pad(kpts_b[:, :, 0] * (w - 1.0), pad)
    py = jnp.pad(kpts_b[:, :, 1] * (h - 1.0), pad)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    slot = jnp.broadcast_to(jnp.arange(kp, dtype=jnp.int32), (bsz, kp))
    key = jnp.where(slot < k, y0, h)          # pad slots sort LAST
    ops = (key, px, py,
           jnp.pad(kpts_b[:, :, 0], pad), jnp.pad(kpts_b[:, :, 1], pad),
           jnp.pad(kpts_b[:, :, 2], pad),
           jnp.pad(valid_b.astype(jnp.int32), pad))
    key_s, pxs, pys, kxs, kys, kss, vs = jax.vmap(
        lambda *o: lax.sort(o, num_keys=1, is_stable=True))(*ops)
    t = kp // kt
    tiles = key_s.reshape(bsz, t, kt)
    starts = jnp.minimum((tiles[:, :, 0] // 8) * 8, (h - rows0) // 8 * 8)
    # pads carry key h and dummy (0, 0) coords; their band mismatch yields
    # zero samples, which the [:k] slice drops — exclude them from the
    # span check
    ok = jnp.all((tiles <= (starts + rows0 - 2)[:, :, None])
                 | (tiles >= h))
    lo_shapes = tuple((int(f.shape[2]), int(f.shape[3]))
                      for f in feats_b[1:])
    padded = tuple(_pad_feat_cm(f) for f in feats_b)

    def _sorted_branch(_):
        return pallas_sample.fused_samples_sorted_batch(
            padded, pxs, pys, starts, h, w, lo_shapes, rows0=rows0,
            interpret=interpret)

    def _full_branch(_):
        return pallas_sample.fused_samples_batch(
            padded, pxs, pys, h, w, lo_shapes, interpret=interpret)

    o = lax.cond(ok, _sorted_branch, _full_branch, None)
    desc = _apply_head(params, o)[:, :k]
    kpts = jnp.stack([kxs[:, :k], kys[:, :k], kss[:, :k]], axis=-1)
    return desc, kpts, vs[:, :k].astype(jnp.bool_)


def alike_sparse_descriptors(params: dict, feats, kpts: jnp.ndarray,
                             h: int, w: int) -> jnp.ndarray:
    """Descriptors at keypoints for the ALIKE aggregation head, from the raw
    branch features (a1 full-res, a2 @/2, a3 @/8, a4 @/32 — each `per`
    channels) instead of the dense desc map.

    kpts [K, >=2] normalized (x, y) as produced by ops/detect.detection;
    sampling positions match sample_at_points: pixel = p * (S - 1).
    Returns [K, 64] f32, equal to sample_at_points(dense_desc, kpts).
    """
    a1, a2, a3, a4 = feats
    px = kpts[:, 0] * (w - 1.0)
    py = kpts[:, 1] * (h - 1.0)
    wh = params["convhead2.weight"][0, 0].astype(jnp.float32)   # [64, 65]
    bh = params.get("convhead2.bias")
    per = a2.shape[-1]

    if a1.shape[0] != h:
        # a1 arrives in the stem's space-to-depth block layout
        # (alike_s2d_feats keeps it there — the un_s2d relayout is pure cost)
        bsz = h // a1.shape[0]
        s1 = sample_direct_blk(a1, px, py, bsz, per)
    else:
        s1 = sample_direct(a1, px, py)
    samples = [
        s1,
        sample_upsampled(a2, px, py, h, w),
        sample_upsampled(a3, px, py, h, w),
        sample_upsampled(a4, px, py, h, w),
    ]
    desc = sum(
        jnp.dot(s, wh[i * per:(i + 1) * per, :-1],
                precision=lax.Precision.HIGHEST)
        for i, s in enumerate(samples))
    if bh is not None:
        desc = desc + bh[:-1].astype(jnp.float32)
    return desc
