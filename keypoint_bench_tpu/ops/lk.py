"""Pyramidal Lucas-Kanade optical flow, fully on-device.

Semantics parity target: reference utils/matcher.py:7-142 `OpticalFlow` —
  * sobel-style gradients via 3x3 convs with kernels [[1,0,-1],[2,0,-2],...]
    (zero padding, per-channel),
  * pyramid built by avg-pooling the *original* image with kernel 2i
    (levels [full, /2, /4] for levels=3),
  * initial points jittered on a circle of radius `distance` and clamped to
    [10, S-10],
  * per level, `iterations` rounds of: bilinear-sample win^2 patches of
    image2 / its gradients at the current points, 2x2 Gauss-Newton solve
    G^-1 b with a det > 1e-6 guard, update pts -= G^-1 b.

TPU design: the reference materializes [C*win^2, H, W] unfolded images and
grid_samples them (utils/matcher.py:111-125). We instead gather the win^2
patch directly per point per iteration (bilinear with zero padding — the two
formulations are mathematically identical), which keeps memory at
[N, win^2, C] and vectorizes over points.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from keypoint_bench_tpu.ops.grid_sample import sample_bilinear_pixels


@dataclasses.dataclass(frozen=True)
class LKParams:
    distance: float = 3.0
    win_size: int = 3
    levels: int = 1
    iterations: int = 40


def _gradients(img: jnp.ndarray):
    """img [H, W, C] -> (dx, dy) with the reference's kernels and zero pad."""
    kx = jnp.array([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]])
    ky = kx.T
    c = img.shape[-1]
    wx = jnp.tile(kx[:, :, None, None], (1, 1, 1, c))
    wy = jnp.tile(ky[:, :, None, None], (1, 1, 1, c))
    x = img[None]
    dn = lax.conv_dimension_numbers(x.shape, wx.shape, ("NHWC", "HWIO", "NHWC"))
    dx = lax.conv_general_dilated(x, wx, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dn, feature_group_count=c,
                                  precision=jax.lax.Precision.HIGHEST)[0]
    dy = lax.conv_general_dilated(x, wy, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dn, feature_group_count=c,
                                  precision=jax.lax.Precision.HIGHEST)[0]
    return dx, dy


def _avg_pool_img(img: jnp.ndarray, k: int) -> jnp.ndarray:
    y = lax.reduce_window(img[None], 0.0, lax.add, (1, k, k, 1),
                          (1, k, k, 1), "VALID")[0]
    return y / (k * k)


def _patch_offsets(win: int):
    half = win // 2
    d = jnp.arange(-half, half + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)  # [win^2]


def _sample_patches(img, pts, ox, oy):
    """img [H,W,C], pts [N,2] pixel coords -> [N, win^2, C]."""
    px = pts[:, 0:1] + ox[None, :]
    py = pts[:, 1:2] + oy[None, :]
    return sample_bilinear_pixels(img, px, py)


def _window_bilinear(field_p, pts, win: int, pad: int):
    """Bilinear patch sampling via ONE slice-gather per point.

    field_p is the field zero-padded by `pad` (>= win+1) on both spatial
    sides. All win^2 patch taps of a point share one fractional offset, so
    their 4 bilinear corners form a single (win+1)^2 INTEGER window: one
    vmapped dynamic_slice (= one gather offset per point; TPU gathers are
    latency-bound per OFFSET, payload-free — PERF.md round 2) replaces
    4*win^2 element gathers. Shifted sub-windows recombine the bilinear
    sum exactly; fully/partially out-of-bounds taps read the zero padding,
    matching grid_sample(padding_mode='zeros') / _gather_2d semantics.
    Returns [N, win, win, C] in the _patch_offsets raster (dy major)."""
    wsz = win + 1
    half = win // 2
    c = field_p.shape[-1]
    x0 = jnp.floor(pts[:, 0])
    y0 = jnp.floor(pts[:, 1])
    fx = (pts[:, 0] - x0)[:, None, None, None]
    fy = (pts[:, 1] - y0)[:, None, None, None]
    ys = jnp.clip(y0.astype(jnp.int32) - half + pad, 0,
                  field_p.shape[0] - wsz)
    xs = jnp.clip(x0.astype(jnp.int32) - half + pad, 0,
                  field_p.shape[1] - wsz)
    w = jax.vmap(lambda y, x: lax.dynamic_slice(
        field_p, (y, x, 0), (wsz, wsz, c)))(ys, xs)
    return ((1 - fy) * (1 - fx) * w[:, :-1, :-1]
            + (1 - fy) * fx * w[:, :-1, 1:]
            + fy * (1 - fx) * w[:, 1:, :-1]
            + fy * fx * w[:, 1:, 1:])


def _lk_level(img1, img2, pts1, pts2, win: int, iterations: int):
    """One pyramid level. imgs [H,W,C]; pts [N,2] in this level's pixels.

    Two gather-count optimizations, both value-exact vs the naive
    per-tap sampling (tests/test_lk.py):
      * the three per-iteration fields (img2, dx2, dy2) stack on channels
        so each point needs ONE slice instead of three;
      * per-point patches come from one (win+1)^2 window slice-gather
        (_window_bilinear) instead of 4*win^2 element gathers."""
    dx2, dy2 = _gradients(img2)
    stacked = jnp.concatenate([img2, dx2, dy2], axis=-1)   # [H, W, 3C]
    pad = win + 1
    stacked_p = jnp.pad(stacked, ((pad, pad), (pad, pad), (0, 0)))
    img1_p = jnp.pad(img1, ((pad, pad), (pad, pad), (0, 0)))
    patch1 = _window_bilinear(img1_p, pts1, win, pad)      # [N, win, win, C]
    n = pts1.shape[0]
    c = img1.shape[-1]

    def body(_, pts_pre):
        f = _window_bilinear(stacked_p, pts_pre, win, pad)
        p2 = f[..., 0:c]
        gx = f[..., c:2 * c]
        gy = f[..., 2 * c:3 * c]
        di = (patch1 - p2).reshape(n, -1)              # [N, w2*C]
        jx = gx.reshape(n, -1)
        jy = gy.reshape(n, -1)
        g00 = jnp.sum(jx * jx, axis=1)
        g01 = jnp.sum(jx * jy, axis=1)
        g11 = jnp.sum(jy * jy, axis=1)
        bx = jnp.sum(di * jx, axis=1)
        by = jnp.sum(di * jy, axis=1)
        det = g00 * g11 - g01 * g01
        ok = det > 1e-6
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        ux = (g11 * bx - g01 * by) * inv_det
        uy = (-g01 * bx + g00 * by) * inv_det
        step = jnp.stack([ux, uy], axis=1)
        return pts_pre - jnp.where(ok[:, None], step, 0.0)

    return lax.fori_loop(0, iterations, body, pts2)


@functools.partial(jax.jit, static_argnames=("params",))
def optical_flow(img1: jnp.ndarray, img2: jnp.ndarray,
                 pts1: jnp.ndarray, pts2: jnp.ndarray,
                 key: jax.Array, params: LKParams = LKParams()):
    """Track pts1 (in [0,1]) from img1 [H,W,C] into img2.

    pts2 is the initial guess in [0,1] (the reference passes pts1 again).
    Returns (tracked pts in [0,1], error clamped at 8 px). Delegates to
    `optical_flow_batch` with a batch of one, so the Pallas in-kernel
    tracker is auto-selected on TPU."""
    tracked, err = optical_flow_batch(img1[None], img2[None], pts1[None],
                                      pts2[None], key[None], params)
    return tracked[0], err[0]


def optical_flow_cv(img0, img1, pts0, pts1, win_size: int = 15,
                    levels: int = 3):
    """cv2.calcOpticalFlowPyrLK host-side path (reference
    utils/matcher.py:145-185 `optical_flow_cv`): OPTFLOW_USE_INITIAL_FLOW,
    returns (tracked pts in [0,1], status). Numpy in/out; used for
    cross-validation of the native LK and as an optional CPU matcher."""
    import cv2
    import numpy as np
    h, w = img0.shape[0], img0.shape[1]
    scale = np.array([w - 1.0, h - 1.0], np.float32)
    p0 = (np.asarray(pts0[:, 0:2]) * scale).astype(np.float32)
    p1 = (np.asarray(pts1[:, 0:2]) * scale).astype(np.float32)
    u0 = (np.asarray(img0) * 255).astype(np.uint8)
    u1 = (np.asarray(img1) * 255).astype(np.uint8)
    lk = dict(winSize=(win_size, win_size), maxLevel=levels,
              flags=cv2.OPTFLOW_USE_INITIAL_FLOW,
              criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                        10, 0.03))
    tracked, status, _ = cv2.calcOpticalFlowPyrLK(u0, u1, p0, p1.copy(), **lk)
    return tracked / scale, status.reshape(-1)


# batched LK implementation: "auto" picks the Pallas in-kernel tracker
# (ops/pallas_lk.py) on TPU when it applies, else the XLA level loop
_LK_IMPL = ["auto"]


def set_lk_impl(impl: str):
    assert impl in ("auto", "xla", "pallas")
    _LK_IMPL[0] = impl


def _use_pallas(img_shape, win: int) -> bool:
    impl = _LK_IMPL[0]
    if impl == "xla":
        return False
    from keypoint_bench_tpu.ops.pallas_lk import supported
    ok = supported(img_shape, win)
    if impl == "pallas":
        return ok
    return ok and jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("params",))
def optical_flow_batch(imgs1: jnp.ndarray, imgs2: jnp.ndarray,
                       pts1: jnp.ndarray, pts2: jnp.ndarray,
                       keys: jax.Array, params: LKParams = LKParams()):
    """Batched `optical_flow`: imgs [B, H, W, C], pts [B, N, >=2] in [0,1],
    keys [B]. Same jitter/pyramid/level semantics; the per-level iteration
    runs through the Pallas in-kernel tracker on TPU (ops/pallas_lk.py —
    673 ns/pt/iter vs the XLA slice-gather path's ~4.4 us, round-5
    PERF.md) or the vmapped XLA loop elsewhere. Returns
    (tracked [B, N, 2] in [0,1], err [B, N])."""
    b, h, w = imgs1.shape[0], imgs1.shape[1], imgs1.shape[2]
    scale = jnp.array([w - 1.0, h - 1.0], jnp.float32)
    p1 = pts1[..., 0:2] * scale
    p2 = pts2[..., 0:2] * scale

    def jit_one(key, pp):
        angle = jax.random.normal(key, (pp.shape[0],)) * 6.28
        jitter = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=1)
        pr = pp + jitter * params.distance
        return jnp.stack([jnp.clip(pr[:, 0], 10, w - 10),
                          jnp.clip(pr[:, 1], 10, h - 10)], axis=1)

    p2r = jax.vmap(jit_one)(keys, p2)

    pyr1 = [imgs1]
    pyr2 = [imgs2]
    for i in range(params.levels - 1):
        k = 2 * (i + 1)
        pyr1.append(jax.vmap(lambda im, kk=k: _avg_pool_img(im, kk))(imgs1))
        pyr2.append(jax.vmap(lambda im, kk=k: _avg_pool_img(im, kk))(imgs2))

    use_pallas = _use_pallas(imgs1.shape[1:], params.win_size)
    pts_pre = p2r
    for i in range(params.levels):
        lvl = params.levels - i - 1
        s = float(2 ** lvl)
        if use_pallas:
            from keypoint_bench_tpu.ops.pallas_lk import lk_level_pallas
            out = lk_level_pallas(pyr1[lvl], pyr2[lvl], p1 / s, pts_pre / s,
                                  params.win_size, params.iterations)
        else:
            out = jax.vmap(
                lambda i1, i2, a, c: _lk_level(i1, i2, a, c,
                                               params.win_size,
                                               params.iterations))(
                pyr1[lvl], pyr2[lvl], p1 / s, pts_pre / s)
        pts_pre = out * s

    err = jnp.minimum(jnp.linalg.norm(pts_pre - p2, axis=-1), 8.0)
    return pts_pre / scale, err
