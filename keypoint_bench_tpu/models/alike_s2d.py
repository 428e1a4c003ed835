"""Space-to-depth ALIKE forward: the TPU-shaped layout for the full-res stem.

Why: XLA pads convolution channels to the 128-lane width, so ALIKE-t's
full-resolution tiny-channel convs (3->8, 8->8 at 512^2) cost the same as
128-channel convs — measured flat ~3.5 ms regardless of width (tools/
profile_r2.py on v5e). Rearranging 4x4 pixel blocks into channels turns the
stem into 3x3 convs with 48->128 and 128->128 channels at 128^2 — the same
arithmetic, an order of magnitude faster (s2d prototype: ~10x).

The transform is exact at the math level: a stride-1 3x3 convolution on
[H, W, C] equals a 3x3 convolution on the [H/b, W/b, b*b*C] block layout with
a sparsified kernel (entries W[dy,dx] scattered to block offsets where
|b*beta + r - a| <= 1), and ALIKE's MaxPool2 windows align with 2x2 sub-blocks
so pooling is an in-channel max. BN/ReLU are per-channel, so parameters
replicate b*b times. Only float summation order changes.

Reference semantics: models/ALike.py:84-164 (via models/alike.py); this module
is a drop-in forward for the same converted torch params after
`transform_params_s2d`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from keypoint_bench_tpu.models import common as c
from keypoint_bench_tpu.models.alike import alike as _alike_ref  # noqa: F401 (parity target)
from keypoint_bench_tpu.models.registry import register

_B = 4  # stem block size


def s2d(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/b, W/b, b*b*C]; channel order (r, s, c)."""
    n, h, w, ch = x.shape
    x = x.reshape(n, h // b, b, w // b, b, ch).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * ch)


def un_s2d(x: jnp.ndarray, b: int, ch: int) -> jnp.ndarray:
    """Inverse of s2d."""
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, b, b, ch).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * b, w * b, ch)


def _conv_w_s2d(W: np.ndarray, b: int) -> np.ndarray:
    """HWIO [3,3,ci,co] stride-1 pad-1 kernel -> [3,3,b*b*ci,b*b*co] block
    kernel with identical math (zero entries where |b*beta + r - a| > 1)."""
    kh, kw, ci, co = W.shape
    assert kh == 3 and kw == 3
    out = np.zeros((3, 3, b * b * ci, b * b * co), np.float32)
    for by in (-1, 0, 1):
        for bx in (-1, 0, 1):
            for r in range(b):
                for s in range(b):
                    for a in range(b):
                        for t in range(b):
                            dy = b * by + r - a
                            dx = b * bx + s - t
                            if abs(dy) <= 1 and abs(dx) <= 1:
                                i0 = (r * b + s) * ci
                                o0 = (a * b + t) * co
                                out[by + 1, bx + 1, i0:i0 + ci,
                                    o0:o0 + co] = W[dy + 1, dx + 1]
    return out


def _stem_w8(W1b: np.ndarray, b: int, ci: int) -> np.ndarray:
    """Block kernel [3,3,b*b*ci,co_blk] -> strided raw-image kernel
    [2b, 2b, ci, co_blk] for conv(stride=b, pad=(1, b-1)): folds the s2d
    input transform into the convolution itself (tap t reads input row
    b*I - 1 + t = b*I + (b*beta + r) for t = b*beta + r + 1)."""
    co_blk = W1b.shape[-1]
    out = np.zeros((2 * b, 2 * b, ci, co_blk), np.float32)
    for by in (-1, 0, 1):
        for bx in (-1, 0, 1):
            for r in range(b):
                for s in range(b):
                    row = b * by + r + 1
                    col = b * bx + s + 1
                    if 0 <= row < 2 * b and 0 <= col < 2 * b:
                        i0 = (r * b + s) * ci
                        out[row, col] += W1b[by + 1, bx + 1, i0:i0 + ci]
    return out


def _conv1_ws2d(w8: np.ndarray, b: int = 4) -> np.ndarray:
    """Stride-b raw-image kernel [2b, 2b, ci, co] -> width-s2d kernel
    [2b, 3, b*ci, co] for input [B, H, W/b, b*ci] (a FREE reshape of the
    NHWC image: (W, ci) -> (W/b, b*ci) preserves linear order). The width
    taps bx in {0,1,2} read X+bx-1 with pad (1,1); tap (bx, q*ci+c) is raw
    dx = b*bx + q - (b-1) when 0 <= dx < 2b. XLA then sees a b*ci-channel
    conv instead of a ci-channel one (49 -> measured-faster us/map for the
    3-channel ALIKE stem, tools/profile_r12b.py)."""
    kh, kw, ci, co = w8.shape
    assert kh == 2 * b and kw == 2 * b
    out = np.zeros((2 * b, 3, b * ci, co), np.float32)
    for bx in range(3):
        for q in range(b):
            dx = b * bx + q - (b - 1)
            if 0 <= dx < 2 * b:
                out[:, bx, q * ci:(q + 1) * ci, :] = w8[:, dx, :, :]
    return out


def transform_params_s2d(params: dict, b: int = _B) -> dict:
    """Converted torch params (models/alike.py contract) -> params with the
    stem (block1.conv1/conv2 + their BNs + conv1 branch) rewritten for the
    block layout. Low-res weights pass through untouched.

    NEGATIVE RESULT (round 4, tools/profile_r12b.py — don't revisit):
    permuting x1b's channels to (r0, s0, r1, s1, c) so MaxPool2 becomes two
    half-tensor maxima made the forward SLOWER (190.9 -> 208-214 us/map at
    512^2 B=96): 64-lane half-slices are still sub-128-lane relayouts,
    while XLA's lane shuffles for the standard reshape-max are cheaper
    than they look."""
    p = dict(params)

    def as_np(x):
        return np.asarray(x, np.float32)

    for conv in ("block1.conv1", "block1.conv2"):
        p[f"{conv}.weight_s2d"] = jnp.asarray(
            _conv_w_s2d(as_np(params[f"{conv}.weight"]), b))
        if f"{conv}.bias" in params:
            p[f"{conv}.bias_s2d"] = jnp.asarray(
                np.tile(as_np(params[f"{conv}.bias"]), b * b))
    # first conv additionally as a stride-b kernel on the raw image (no s2d
    # transpose of the input needed)
    ci0 = as_np(params["block1.conv1.weight"]).shape[2]
    p["block1.conv1.weight_s2d8"] = jnp.asarray(
        _stem_w8(np.asarray(p["block1.conv1.weight_s2d"], np.float32), b,
                 ci0))
    # ... and as the width-s2d kernel (free input reshape, 12-channel conv;
    # measured ~equal to w8 on v5e — kept behind set_stem_impl)
    p["block1.conv1.weight_ws2d"] = jnp.asarray(_conv1_ws2d(
        np.asarray(p["block1.conv1.weight_s2d8"], np.float32), b))
    for bn in ("block1.bn1", "block1.bn2"):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            p[f"{bn}.{stat}_s2d"] = jnp.asarray(
                np.tile(as_np(params[f"{bn}.{stat}"]), b * b))
    def blockdiag_1x1(Wa: np.ndarray, nb: int) -> np.ndarray:
        ci, co = Wa.shape[2], Wa.shape[3]
        Wb = np.zeros((1, 1, nb * ci, nb * co), np.float32)
        for k in range(nb):
            Wb[0, 0, k * ci:(k + 1) * ci, k * co:(k + 1) * co] = Wa[0, 0]
        return Wb

    # a1 branch: 1x1 conv is block-diagonal in block space
    p["conv1.weight_s2d"] = jnp.asarray(
        blockdiag_1x1(as_np(params["conv1.weight"]), b * b))
    if "conv1.bias" in params:
        p["conv1.bias_s2d"] = jnp.asarray(
            np.tile(as_np(params["conv1.bias"]), b * b))

    # block2 in s2d(2): the H/2 trunk runs 16->64-channel convs at H/4
    # instead of tiny-channel convs at H/2 (XLA pads conv channels to 128
    # lanes, so the work scales with PIXELS, not channels — 4x less). The
    # pooled x1 already comes out of the stem in the s2d(2) layout.
    b2 = 2
    for conv in ("block2.conv1", "block2.conv2"):
        p[f"{conv}.weight_s2d2"] = jnp.asarray(
            _conv_w_s2d(as_np(params[f"{conv}.weight"]), b2))
        if f"{conv}.bias" in params:
            p[f"{conv}.bias_s2d2"] = jnp.asarray(
                np.tile(as_np(params[f"{conv}.bias"]), b2 * b2))
    p["block2.downsample.weight_s2d2"] = jnp.asarray(
        blockdiag_1x1(as_np(params["block2.downsample.weight"]), b2 * b2))
    if "block2.downsample.bias" in params:
        p["block2.downsample.bias_s2d2"] = jnp.asarray(
            np.tile(as_np(params["block2.downsample.bias"]), b2 * b2))
    for bn in ("block2.bn1", "block2.bn2"):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            p[f"{bn}.{stat}_s2d2"] = jnp.asarray(
                np.tile(as_np(params[f"{bn}.{stat}"]), b2 * b2))
    # a2 head (1x1, 16->16) applied in block space, un-blocked after
    p["conv2.weight_s2d2"] = jnp.asarray(
        blockdiag_1x1(as_np(params["conv2.weight"]), b2 * b2))
    if "conv2.bias" in params:
        p["conv2.bias_s2d2"] = jnp.asarray(
            np.tile(as_np(params["conv2.bias"]), b2 * b2))
    return p


def _bn_s2d(x, p, bn):
    return c.bn_eval(x, p[f"{bn}.weight_s2d"], p[f"{bn}.bias_s2d"],
                     p[f"{bn}.running_mean_s2d"], p[f"{bn}.running_var_s2d"])


# stem conv1 formulation: "w8" (stride-4 conv on the raw 3-channel image,
# default) or "ws2d" (width-s2d free reshape + 12-channel conv). Both exact
# (see _conv1_ws2d / _stem_w8); measured ~equal on v5e (49.1 vs 46.1 us/map
# standalone, but ws2d was slightly SLOWER in the full forward —
# tools/profile_r12b.py round 4), so the simpler w8 stays default.
_STEM_IMPL = ["w8"]


def set_stem_impl(impl: str):
    assert impl in ("ws2d", "w8")
    _STEM_IMPL[0] = impl


def _branches(params: dict, image: jnp.ndarray, keep_blocked: bool = False,
              trunk_only: bool = False):
    """Shared trunk: stem (s2d layout) + blocks + per-branch aggregation
    features. Returns (a1 full-res, a2 @H/2, a3 @H/8, a4 @H/32, hp, cast).
    With `keep_blocked`, a1 and a2 are returned in their raw block layouts
    (a1b [., H/4, W/4, 256] s2d(4); a2b [., H/4, W/4, 64] s2d(2)) — the
    channel-major feats path (alike_s2d_feats_cm) un-blocks them with a
    single fused permute instead of un_s2d + a second transpose. a2 is
    blocked only when the s2d(2) block2 weights are present (it is NHWC
    otherwise — callers must check its rank/shape). With `trunk_only`
    (requires the s2d(2) weights), the a1/a2 slots carry the raw trunk
    tensors x1b / x2b instead and the branch 1x1 convs are NOT applied —
    the dilated-conv cm path folds them into its depth-to-space convs."""
    p = params
    b = _B
    assert not trunk_only or "block2.conv1.weight_s2d2" in p, \
        "trunk_only requires the s2d(2) block2 weights"
    cast = (lambda w: w.astype(jnp.bfloat16)) if \
        p["block2.conv1.weight"].dtype == jnp.bfloat16 else (lambda w: w)
    hp = None if cast(p["block2.conv1.weight"]).dtype == jnp.bfloat16 \
        else jax.lax.Precision.HIGHEST

    # Pre-blocked input [B, H/4, W/4, 48] (host_s2d_images / the C++
    # prefetcher's s2d emit): the stem starts from full-lane operands and
    # conv1 is the plain [3,3,48,128] block conv — no in-graph transpose
    # and no strided tiny-channel conv (conv1 was 49.1 of 191 us/map as
    # the raw-image w8 conv, an XLA-lowering gap; round-4 verdict item 2).
    # Detected by channel count (48 vs 3) — exact same math as the raw
    # path (_conv_w_s2d identity; tests/test_alike_s2d.py).
    if image.shape[-1] == p["block1.conv1.weight_s2d"].shape[2]:
        wk = cast(p["block1.conv1.weight_s2d"])
        y = jax.lax.conv_general_dilated(
            image.astype(wk.dtype), wk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                image.shape, wk.shape, ("NHWC", "HWIO", "NHWC")),
            precision=c._CONV_PRECISION[0],
            preferred_element_type=jnp.bfloat16 if wk.dtype == jnp.bfloat16
            else jnp.float32)
    # stem conv1: "ws2d" is the opt-in alternative behind set_stem_impl —
    # the (W, 3) -> (W/4, 12) input reshape is FREE (identical linear
    # order) and the 12-channel stride-(4,1) conv measured ~equal to w8
    # standalone (46.1 vs 49.1 us/map) but slightly slower in the full
    # forward (tools/profile_r12b.py round 4), so w8 stays the default
    elif _STEM_IMPL[0] == "ws2d" and "block1.conv1.weight_ws2d" in p:
        wk = cast(p["block1.conv1.weight_ws2d"])
        nb, hh, ww, ci_ = image.shape
        imgw = image.reshape(nb, hh, ww // b, b * ci_)
        dn = jax.lax.conv_dimension_numbers(imgw.shape, wk.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            imgw.astype(wk.dtype), wk, (b, 1), [(1, b - 1), (1, 1)],
            dimension_numbers=dn,
            precision=c._CONV_PRECISION[0],
            preferred_element_type=jnp.bfloat16 if wk.dtype == jnp.bfloat16
            else jnp.float32)
    else:
        w8 = cast(p["block1.conv1.weight_s2d8"])
        dn = jax.lax.conv_dimension_numbers(image.shape, w8.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            image.astype(w8.dtype), w8, (b, b), [(1, b - 1), (1, b - 1)],
            dimension_numbers=dn,
            precision=c._CONV_PRECISION[0],
            preferred_element_type=jnp.bfloat16 if w8.dtype == jnp.bfloat16
            else jnp.float32)
    if "block1.conv1.bias_s2d" in p:
        y = y + p["block1.conv1.bias_s2d"]
    y = c.relu(_bn_s2d(y, p, "block1.bn1"))
    y = c.conv2d(y, cast(p["block1.conv2.weight_s2d"]),
                 p.get("block1.conv2.bias_s2d"), 1, 1)
    x1b = c.relu(_bn_s2d(y, p, "block1.bn2"))  # [B,H/4,W/4,128] perm order

    if trunk_only:
        a1 = x1b
    else:
        a1b = c.relu(c.conv2d(x1b, cast(p["conv1.weight_s2d"]),
                              p.get("conv1.bias_s2d"), 1, 0))  # [.,.,.,256]
        a1 = a1b if keep_blocked else \
            un_s2d(a1b, b, p["conv1.weight"].shape[-1])        # full res

    # MaxPool2 on full-res x1 == max over the 2x2 sub-blocks: channel index
    # (r, s, c) with r = 2*r1 + r0 -> reduce r0, s0; the (r1, s1, c) result is
    # the s2d(2) layout of pooled x1 at H/2. (Reordering channels so these
    # are half-tensor maxima measured SLOWER — see transform_params_s2d.)
    n, h, w, _ = x1b.shape
    cc = p["block1.conv2.weight"].shape[-1]
    v = x1b.reshape(n, h, w, 2, 2, 2, 2, cc)
    pooled = jnp.max(jnp.max(v, axis=6), axis=4)              # drop s0, r0
    pooled = pooled.reshape(n, h, w, 4 * cc)  # s2d(2) of pooled x1 at H/2

    if "block2.conv1.weight_s2d2" in p:
        # block2 in the s2d(2) layout straight off the stem's pooled output:
        # conv channels pad to 128 lanes, so 16->64ch at H/4 is ~4x less
        # conv work than 8->16ch at H/2 (same math, _conv_w_s2d(, 2))
        idn = c.conv2d(pooled, cast(p["block2.downsample.weight_s2d2"]),
                       p.get("block2.downsample.bias_s2d2"), 1, 0)
        y = c.conv2d(pooled, cast(p["block2.conv1.weight_s2d2"]),
                     p.get("block2.conv1.bias_s2d2"), 1, 1)
        y = c.relu(c.bn_eval(y, p["block2.bn1.weight_s2d2"],
                             p["block2.bn1.bias_s2d2"],
                             p["block2.bn1.running_mean_s2d2"],
                             p["block2.bn1.running_var_s2d2"]))
        y = c.conv2d(y, cast(p["block2.conv2.weight_s2d2"]),
                     p.get("block2.conv2.bias_s2d2"), 1, 1)
        y = c.bn_eval(y, p["block2.bn2.weight_s2d2"],
                      p["block2.bn2.bias_s2d2"],
                      p["block2.bn2.running_mean_s2d2"],
                      p["block2.bn2.running_var_s2d2"])
        x2b = c.relu(y + idn)                                 # [B,H/4,W/4,64]
        cc2 = p["block2.conv2.weight"].shape[-1]
        if trunk_only:
            a2 = x2b
        else:
            a2b = c.relu(c.conv2d(x2b, cast(p["conv2.weight_s2d2"]),
                                  p.get("conv2.bias_s2d2"), 1, 0))
            a2 = a2b if keep_blocked else un_s2d(a2b, 2, cc2)  # [B,H/2,W/2,16]
        # MaxPool4 on full-res x2 == max over the 2x2 sub-blocks then a 2x2
        # block-grid pool (exactly the stem pooling identity one level up)
        m = jnp.max(x2b.reshape(n, h, w, 2, 2, cc2), axis=(3, 4))
        x3_in = c.max_pool(m, 2)                              # [B,H/8,.,16]
    else:
        x1p = un_s2d(pooled, 2, cc)                           # [B,H/2,W/2,8]
        x2 = c.res_block(x1p, p, "block2")
        a2 = c.relu(c.conv2d(x2, p["conv2.weight"], p.get("conv2.bias"),
                             1, 0))
        x3_in = c.max_pool(x2, 4)

    x3 = c.res_block(x3_in, p, "block3")
    x4 = c.res_block(c.max_pool(x3, 4), p, "block4")

    a3 = c.relu(c.conv2d(x3, p["conv3.weight"], p.get("conv3.bias"), 1, 0))
    a4 = c.relu(c.conv2d(x4, p["conv4.weight"], p.get("conv4.bias"), 1, 0))
    return a1, a2, a3, a4, hp, cast


def _combined_up_1ch(maps, H, W, hp):
    """_combined_up for single-channel maps (the score head): squeezing the
    channel keeps W on the lane axis for BOTH interp matmuls ([B,h,w] @
    [w,O] then [O,h] @ [B,h,W]); the [...,1] form leaves a 1-lane minor
    dimension that wastes the vector unit. maps: [B, h_i, w_i, 1]."""
    dt = maps[0].dtype
    cols = [jnp.einsum("bhw,wo->bho", m[..., 0],
                       jnp.asarray(c._interp_matrix(W, m.shape[2]).T, dt),
                       precision=hp)
            for m in maps]
    rows_in = jnp.concatenate(cols, axis=1)           # [B, h2+h3+h4, W]
    A = np.concatenate([c._interp_matrix(H, m.shape[1])
                        for m in maps], axis=1)
    return jnp.einsum("oh,bhw->bow", jnp.asarray(A, dt), rows_in,
                      precision=hp)[..., None]


def _combined_up(maps, H, W, hp):
    """upsample-and-sum as ONE row-interp matmul: bilinear upsampling is
    separable, so column-upsample each branch at its own (low) row count,
    concatenate along rows (major dim — cheap), and a single combined
    [H, h2+h3+h4] interp matrix computes up2 + up8 + up32 in one MXU dot
    instead of three full-res tensors plus a 4-way add."""
    dt = maps[0].dtype
    cols = [jnp.einsum("ow,bhwc->bhoc",
                       jnp.asarray(c._interp_matrix(W, m.shape[2]), dt),
                       m, precision=hp)
            for m in maps]
    rows_in = jnp.concatenate(cols, axis=1)           # [B, h2+h3+h4, W, C]
    A = np.concatenate([c._interp_matrix(H, m.shape[1])
                        for m in maps], axis=1)
    return jnp.einsum("oh,bhwc->bowc", jnp.asarray(A, dt), rows_in,
                      precision=hp)


@register("Alike_s2d")
def alike_s2d(params: dict, image: jnp.ndarray):
    """image [B,H,W,3] (H, W multiples of 4) -> (score, desc); identical to
    models.alike.alike up to float summation order. params must have gone
    through transform_params_s2d.

    Beyond the s2d stem, two more measured TPU rewrites (tools/profile_r2c.py):
    * the first block conv runs as a stride-4 conv on the raw image (kernel
      _stem_w8), folding the s2d transpose away entirely;
    * the aggregation head is decomposed per branch BEFORE upsampling
      (1x1 head o upsample == upsample o 1x1 head, both linear): the 64-lane
      channel concat at full res cost ~7.4 ms on v5e (misaligned 16-lane
      pieces force relayouts), while per-branch low-res heads + fused adds
      avoid it, and the desc/score split happens in the weights so no
      channel slicing remains at full res.
    """
    p = params
    a1, a2, a3, a4, hp, cast = _branches(p, image)

    # decomposed head: head(concat(a_i)) == sum_i a_i @ Wh[16i:16(i+1)], and
    # the 1x1 head commutes with bilinear upsampling, so each low-res branch
    # is projected to (desc 64 | score 1) first and upsampled after
    wh = cast(p["convhead2.weight"])[0, 0]                    # [64, 65]
    bh = p.get("convhead2.bias")
    per = a1.shape[-1]

    def proj(a, i):
        whi = wh[i * per:(i + 1) * per]
        d = jnp.einsum("bhwc,cd->bhwd", a, whi[:, :-1], precision=hp)
        s = jnp.einsum("bhwc,c->bhw", a, whi[:, -1], precision=hp)
        return d, s[..., None]

    d1, s1 = proj(a1, 0)
    d2, s2 = proj(a2, 1)
    d3, s3 = proj(a3, 2)
    d4, s4 = proj(a4, 3)

    H, W = a1.shape[1], a1.shape[2]
    desc = d1 + _combined_up((d2, d3, d4), H, W, hp)
    score = s1 + _combined_up_1ch((s2, s3, s4), H, W, hp)
    if bh is not None:
        desc = desc + bh[:-1]
        score = score + bh[-1]
    return jax.nn.sigmoid(score.astype(jnp.float32)).astype(desc.dtype), desc


def alike_s2d_feats(params: dict, image: jnp.ndarray):
    """Sparse-descriptor forward: the full score map plus the RAW branch
    features — no dense descriptor map is ever materialized (its ~32 MB/img
    of HBM traffic is the dominant pipeline cost, PERF.md). Descriptors for
    detected keypoints come from ops/sparse_desc.alike_sparse_descriptors,
    exactly equal to sampling the dense map (sampling, upsampling and the
    1x1 head are all linear and commute).

    Returns (score [B,H,W,1], (a1 [B,H,W,16], a2 [B,H/2,W/2,16],
    a3 [B,H/8,W/8,16], a4 [B,H/32,W/32,16])).

    NOTE (measured, don't revisit): keeping a1 in the stem's block layout
    (skipping un_s2d, sampling via ops/sparse_desc.sample_direct_blk and
    projecting the score per block position) HALVED the bench — the per-r
    64-lane channel slices of the [.,.,256] tensor and the (16,16) channel
    reshape are exactly the <128-lane relayout pathology (CLAUDE.md).
    un_s2d IS the matmul-optimal relayout for the sampler's row-contraction
    operand; its ~60 us/map is the fair price (tools/profile_r8.py, bench
    1999 -> 1005 fps with the block path).
    """
    p = params
    a1, a2, a3, a4, hp, cast = _branches(p, image)
    wh = cast(p["convhead2.weight"])[0, 0]
    bh = p.get("convhead2.bias")
    per = a2.shape[-1]

    def proj_s(a, i):
        return jnp.einsum("bhwc,c->bhw", a, wh[i * per:(i + 1) * per, -1],
                          precision=hp)[..., None]

    H, W = a1.shape[1], a1.shape[2]
    score = proj_s(a1, 0) + _combined_up_1ch(
        (proj_s(a2, 1), proj_s(a3, 2), proj_s(a4, 3)), H, W, hp)
    if bh is not None:
        score = score + bh[-1]
    score = jax.nn.sigmoid(score.astype(jnp.float32)).astype(a1.dtype)
    return score, (a1, a2, a3, a4)


def _score_proj_blk(ab: jnp.ndarray, b: int, wh_col: jnp.ndarray, hp):
    """Score projection evaluated in block space: for a block-layout feature
    ab [B, h, w, b*b*C] (channel order (r, s, c)), computes the [B, h*b,
    w*b, 1] map equal to ``proj_s(un_s2d(ab))`` — but the matmul runs on the
    small block tensor and only the 1-channel result is un-blocked (0.5 MB
    instead of an 8.4 MB full-res relayout at 512^2). The projection matrix
    is block-structured: M[p*C + c, p] = wh_col[c]."""
    nc = ab.shape[-1]
    cch = nc // (b * b)
    m = jnp.zeros((nc, b * b), wh_col.dtype)
    for pidx in range(b * b):
        m = m.at[pidx * cch:(pidx + 1) * cch, pidx].set(wh_col)
    s_blk = jnp.einsum("bhwq,qp->bhwp", ab, m.astype(ab.dtype), precision=hp)
    return un_s2d(s_blk, b, 1)


# Implementation of the cm branch features (a1/a2) in alike_s2d_feats_cm:
#   "permute": block conv1x1 then one big XLA permute to NCHW (_to_cm).
#   "dilated": ONE lhs-dilated conv per branch — depth-to-space is a conv
#              with one-hot block taps, the 1x1 branch head folds into its
#              weights, and dimension_numbers emit NCHW directly (no
#              explicit relayout at all). Exact math either way.
# Default "dilated": measured 2238 vs 2005 fps end-to-end at 512^2 batch 96
# (tools/profile_r10.py, round 3) — the conv-emitted NCHW features both
# skip the big permute and DMA better in the sampler kernel.
_CM_BRANCH_IMPL = ["dilated"]


def set_cm_branch_impl(impl: str):
    assert impl in ("permute", "dilated")
    _CM_BRANCH_IMPL[0] = impl


def _branch_cm_dilated(xb: jnp.ndarray, w1: jnp.ndarray, bias, b: int,
                       cast, chan_perm=None) -> jnp.ndarray:
    """relu(conv1x1(un_s2d(xb))) emitted channel-major NCHW by one
    lhs-dilated conv. xb [B, h, w, b*b*ci] (s2d block layout, channel
    order (r, s, c) — or that order permuted by `chan_perm`, with
    xb[..., j] holding standard channel chan_perm[j]); w1 [ci, co] the 1x1
    branch head. Output [B, co, h*b, w*b]. Tap derivation: with
    lhs_dilation=b and padding b-1, output (y, x) = (b*Y + r, b*X + s)
    reads dilated position (b*Y, b*X) through kernel tap
    (b-1-r, b-1-s), so K[a, bp, q, :] = w1[c, :] iff
    q = ((b-1-a)*b + (b-1-bp))*ci + c (then rows permuted by chan_perm)."""
    ci, co = w1.shape
    k = jnp.zeros((b, b, b * b * ci, co), w1.dtype)
    for a in range(b):
        for bp in range(b):
            q0 = ((b - 1 - a) * b + (b - 1 - bp)) * ci
            k = k.at[a, bp, q0:q0 + ci, :].set(w1)
    if chan_perm is not None:
        k = k[:, :, jnp.asarray(chan_perm), :]
    k = cast(k)
    xb = xb.astype(k.dtype)     # bn_eval promotes bf16 trunks to f32
    dn = jax.lax.conv_dimension_numbers(xb.shape, k.shape,
                                        ("NHWC", "HWIO", "NCHW"))
    out = jax.lax.conv_general_dilated(
        xb, k, (1, 1), ((b - 1, b - 1), (b - 1, b - 1)),
        lhs_dilation=(b, b), dimension_numbers=dn,
        precision=c._CONV_PRECISION[0],
        preferred_element_type=jnp.bfloat16 if xb.dtype == jnp.bfloat16
        else jnp.float32)
    if bias is not None:
        out = out + bias[None, :, None, None].astype(out.dtype)
    return c.relu(out)


def _to_cm(ab: jnp.ndarray, b: int, ch: int) -> jnp.ndarray:
    """Block layout [B, h, w, b*b*ch] -> channel-major NCHW
    [B, ch, h*b, w*b] (out[n, c, y, x] = feature[y, x, c]): ONE fused
    permute replacing un_s2d + a second transpose."""
    n, hb, wb, _ = ab.shape
    x = ab.reshape(n, hb, wb, b, b, ch)        # (B, Y, X, r, s, c)
    x = x.transpose(0, 5, 1, 3, 2, 4)          # (B, c, Y, r, X, s)
    return x.reshape(n, ch, hb * b, wb * b)


def alike_s2d_feats_cm(params: dict, image: jnp.ndarray):
    """`alike_s2d_feats` with the branch features in the CHANNEL-MAJOR
    NCHW layout the fused Pallas sampler consumes (a_it [B, C, H_i, W_i]
    — ops/pallas_sample.py): indexing the leading channel dim in VMEM is
    free, where the NHWC 16-channel minor dim would waste 8x of every lane
    register. Identical score map to `alike_s2d_feats` up to float
    summation order; the score heads for a1/a2 run in block space
    (_score_proj_blk) so no full-res NHWC tensor is ever materialized.

    Returns (score [B,H,W,1], (f1t [B,16,H,W], f2t [B,16,H/2,W/2],
    f3t [B,16,H/8,W/8], f4t [B,16,H/32,W/32])).
    """
    p = params
    if "block2.conv1.weight_s2d2" not in p:
        score, feats = alike_s2d_feats(params, image)
        return score, tuple(jnp.transpose(f, (0, 3, 1, 2)) for f in feats)

    dilated = _CM_BRANCH_IMPL[0] == "dilated"
    if dilated:
        x1b, x2b, a3, a4, hp, cast = _branches(p, image, trunk_only=True)
        hb, wb = x1b.shape[1], x1b.shape[2]
    else:
        a1b, a2b, a3, a4, hp, cast = _branches(p, image, keep_blocked=True)
        hb, wb = a1b.shape[1], a1b.shape[2]
    wh = cast(p["convhead2.weight"])[0, 0]                    # [64, 65]
    bh = p.get("convhead2.bias")
    per = p["conv1.weight"].shape[-1]
    H, W = hb * _B, wb * _B

    def proj_s(a, i):
        return jnp.einsum("bhwc,c->bhw", a, wh[i * per:(i + 1) * per, -1],
                          precision=hp)[..., None]

    if dilated:
        f1t = _branch_cm_dilated(x1b, cast(p["conv1.weight"])[0, 0],
                                 p.get("conv1.bias"), _B, cast)
        f2t = _branch_cm_dilated(x2b, cast(p["conv2.weight"])[0, 0],
                                 p.get("conv2.bias"), 2, cast)
        s1 = jnp.einsum("bchw,c->bhw", f1t, wh[:per, -1],
                        precision=hp)[..., None]
        s2 = jnp.einsum("bchw,c->bhw", f2t, wh[per:2 * per, -1],
                        precision=hp)[..., None]
    else:
        f1t = _to_cm(a1b, _B, per)
        f2t = _to_cm(a2b, 2, per)
        s1 = _score_proj_blk(a1b, _B, wh[:per, -1], hp)
        s2 = _score_proj_blk(a2b, 2, wh[per:2 * per, -1], hp)
    score = s1 + _combined_up_1ch((s2, proj_s(a3, 2), proj_s(a4, 3)),
                                  H, W, hp)
    if bh is not None:
        score = score + bh[-1]
    score = jax.nn.sigmoid(score.astype(jnp.float32)).astype(f1t.dtype)

    return score, (f1t, f2t,
                   jnp.transpose(a3, (0, 3, 1, 2)),
                   jnp.transpose(a4, (0, 3, 1, 2)))


def alike_s2d_sparse_detect_batch(params: dict, images: jnp.ndarray,
                                  detect_params):
    """Batched detection + SPARSE keypoint-only descriptors — the shared
    head used by the pipelined runners and the sharded eval steps
    (parallel/evaluate.py). The dense full-res [B, H, W, 64] descriptor map
    is never materialized: keypoint descriptors come from exact composite
    sampling of the branch features (ops/sparse_desc.py; parity with dense
    sampling proven in tests/test_sparse_desc.py). On TPU the fused
    channel-major Pallas sampler runs; elsewhere the exact XLA composite
    sampler (the Pallas kernel has no CPU lowering).

    Returns (score [B,H,W(,1)], desc [B,K,64] f32, kpts [B,K,3],
    valid [B,K]). Protocol anchor: the reference only ever samples its
    dense map at keypoints (utils/matcher.py:221-234)."""
    import jax as _jax
    from keypoint_bench_tpu.ops.detect import detection_batch

    h, w = images.shape[1], images.shape[2]
    if _jax.default_backend() == "tpu":
        from keypoint_bench_tpu.ops.sparse_desc import \
            alike_sparse_descriptors_cm_batch
        score, feats = alike_s2d_feats_cm(params, images)
        kpts, valid = detection_batch(score, detect_params)
        desc = alike_sparse_descriptors_cm_batch(
            params, tuple(feats), kpts, h, w)
    else:
        from keypoint_bench_tpu.ops.sparse_desc import \
            alike_sparse_descriptors
        score, feats = alike_s2d_feats(params, images)
        kpts, valid = detection_batch(score, detect_params)
        desc = _jax.vmap(
            lambda f1, f2, f3, f4, kk: alike_sparse_descriptors(
                params, (f1, f2, f3, f4), kk, h, w))(*feats, kpts)
    return score, desc, kpts, valid


def host_s2d_images(imgs: np.ndarray, b: int = _B) -> np.ndarray:
    """Host-side space-to-depth: [N, H, W, C] -> [N, H/b, W/b, b*b*C] with
    the (r, s, c) channel order the s2d weights expect — the numpy twin of
    `s2d` for data loaders. Feeding this layout to the forward deletes
    conv1's in-graph cost (the strided raw-image conv is an XLA-lowering
    gap; the C++ prefetcher emits this layout during decode for free,
    runtime/loader.cpp)."""
    n, h, w, ch = imgs.shape
    assert h % b == 0 and w % b == 0, (h, w, b)
    x = imgs.reshape(n, h // b, b, w // b, b, ch)
    return np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5)).reshape(
        n, h // b, w // b, b * b * ch)
